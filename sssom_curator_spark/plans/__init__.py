"""Logical-plan builders: parameterized query surfaces compiled to DataFrame plans."""

from sssom_curator_spark.plans.state_query import QueryState, apply_state

__all__ = ["QueryState", "apply_state"]
