"""Operator kit: relational, grounding, embedding, dedup, similarity, text-analysis."""
