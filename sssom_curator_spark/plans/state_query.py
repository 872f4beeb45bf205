"""The Query/State predicate family (SURVEY.md F5/O2) as a plan builder.

The reference's web UI compiles request parameters into either in-memory
row filters (web/backends/memory.py:87-92) or SQLAlchemy WHERE clauses
(web/backends/database.py:89-96) — the latter being the only real "logical
plan" in the system (web/utils.py:60-76, exercised
tests/wsgi_cases.py:159-181). Here the same parameter surface compiles to
one declarative DataFrame plan; Catalyst pushes every predicate to the
scan, which is the Spark equivalent of the reference's SQL-backend
pushdown.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from operator import and_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sssom_curator_spark.functions.curie_ops import curie_prefix
from sssom_curator_spark.operators.relational import paginate

__all__ = ["QueryState", "apply_state", "pagination_elements"]


@dataclass
class QueryState:
    """Mirror of the reference ``State`` model (web/utils.py:60-76)."""

    query: str | None = None
    subject_query: str | None = None
    object_query: str | None = None
    prefix: str | None = None
    subject_prefix: str | None = None
    object_prefix: str | None = None
    mapping_tool: str | None = None
    same_text: bool = False
    sort: str = "desc"
    offset: int = 0
    limit: int = 10
    target_references: list[str] = field(default_factory=list)


def _contains_side(q: str, id_col: str, label_col: str) -> Column:
    needle = F.lit(q.lower())
    return F.lower(F.col(id_col)).contains(needle) | F.lower(
        F.coalesce(F.col(label_col), F.lit(""))
    ).contains(needle)


def _predicates(state: QueryState) -> list[Column]:
    preds: list[Column] = []
    if state.query:
        preds.append(
            _contains_side(state.query, "subject_id", "subject_label")
            | _contains_side(state.query, "object_id", "object_label")
        )
    if state.subject_query:
        preds.append(_contains_side(state.subject_query, "subject_id", "subject_label"))
    if state.object_query:
        preds.append(_contains_side(state.object_query, "object_id", "object_label"))
    if state.prefix:
        preds.append(
            (curie_prefix("subject_id") == state.prefix)
            | (curie_prefix("object_id") == state.prefix)
        )
    if state.subject_prefix:
        preds.append(curie_prefix("subject_id") == state.subject_prefix)
    if state.object_prefix:
        preds.append(curie_prefix("object_id") == state.object_prefix)
    if state.mapping_tool:
        preds.append(F.col("mapping_tool") == state.mapping_tool)
    if state.same_text:
        preds.append(
            F.lower(F.col("subject_label")).eqNullSafe(F.lower(F.col("object_label")))
        )
    if state.target_references:
        # F6 target-reference pre-filter (web/backends/base.py:41): an
        # isin against a broadcast-sized literal set.
        preds.append(
            F.col("subject_id").isin(state.target_references)
            | F.col("object_id").isin(state.target_references)
        )
    return preds


def apply_state(df: DataFrame, state: QueryState, *, paginated: bool = True) -> DataFrame:
    """Compile the State into filter → sort → offset/limit."""
    preds = _predicates(state)
    out = df.filter(reduce(and_, preds)) if preds else df
    if paginated:
        out = paginate(out, sort=state.sort, offset=state.offset, limit=state.limit)
    return out


def pagination_elements(
    *, offset: int, limit: int, remaining_rows: int
) -> list[dict[str, object]]:
    """O4 pagination elements (reference web/utils.py:101-123).

    Driver-side arithmetic over the paged state: First/Previous render
    when a full previous page exists, Next/Last when a full next page
    does. Field names, icons, texts, and positions mirror the reference's
    ``PaginationElement`` golden behavior, including the thousands
    separator in the button texts.
    """
    rv: list[dict[str, object]] = []

    def _append(off: int | None, icon: str, text: str, position: str) -> None:
        rv.append({"offset": off, "icon": icon, "text": text, "position": position})

    if 0 <= offset - limit:
        _append(None, "skip-start-circle", "First", "after")
        _append(offset - limit, "skip-backward-circle", f"Previous {limit:,}", "after")
    if offset < remaining_rows - limit:
        _append(offset + limit, "skip-forward-circle", f"Next {limit:,}", "before")
        _append(
            remaining_rows - limit,
            "skip-end-circle",
            f"Last ({remaining_rows:,})",
            "before",
        )
    return rv
