"""Deterministic html → text extraction (north-rule stage 1).

BASELINE.json mandates "trafilatura-style text extraction per page
(byte-identical per url to the reference)". The sandbox has no trafilatura
and the reference itself does no HTML handling, so the contract is pinned
by OUR fixture generator (:mod:`sssom_curator_spark.sources.pages`): the
extractor must recover the planted ``text`` byte-identically from the
generated HTML — the per-row invariant the tests enforce per url.

The extractor is a pure function (no state, no I/O, no locale/time
dependence) run as an Arrow-batched series transform inside ``mapInPandas``
/ ``pandas_udf`` — never row-at-a-time Python at the Spark layer.

Rules (applied in order, all deterministic):
1. drop ``<script>``/``<style>``/``<noscript>``/``<template>`` subtrees
   and HTML comments;
2. drop boilerplate containers: ``<nav>``, ``<header>``, ``<footer>``,
   ``<aside>``, and any element with class/id containing ``nav``/``menu``/
   ``footer``/``banner``/``cookie`` (character-for-character, lowercase);
3. block-level tags emit newlines, inline tags nothing;
4. decode HTML entities;
5. collapse runs of spaces/tabs within lines, drop empty lines, join with
   single newlines.
"""

from __future__ import annotations

import html as _html
import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["extract_text", "extract_text_udf", "with_extracted_text"]

_DROP_SUBTREE = ("script", "style", "noscript", "template", "nav", "header", "footer", "aside")
_BOILER_ATTR = re.compile(
    r"""(?:class|id)\s*=\s*["'][^"']*(?:nav|menu|footer|banner|cookie)[^"']*["']""",
    re.IGNORECASE,
)
_BLOCK_TAGS = {
    "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "tr", "table", "section", "article", "blockquote", "pre", "hr", "main", "body",
}
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:\s[^<>]*?)?)(/?)>", re.DOTALL)
_WS_RE = re.compile(r"[ \t\r\f\v]+")


def extract_text(html: bytes | str | None) -> str | None:
    """Pure deterministic extraction; byte-identical for identical input."""
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub("", html)

    out: list[str] = []
    pos = 0
    skip_until: list[str] = []  # stack of tag names whose subtree is dropped
    for m in _TAG_RE.finditer(s):
        text_chunk = s[pos : m.start()]
        if not skip_until:
            out.append(text_chunk)
        pos = m.end()
        closing, tag, attrs, selfclose = m.group(1), m.group(2).lower(), m.group(3), m.group(4)
        if skip_until:
            if closing and tag == skip_until[-1]:
                skip_until.pop()
            elif not closing and not selfclose and tag == skip_until[-1]:
                skip_until.append(tag)  # nested same-tag: track depth
            continue
        if not closing:
            dropped = tag in _DROP_SUBTREE or (attrs and _BOILER_ATTR.search(attrs))
            if dropped and not selfclose and tag != "br" and tag != "hr":
                skip_until.append(tag)
                continue
        if tag in _BLOCK_TAGS:
            out.append("\n")
    if not skip_until:
        out.append(s[pos:])

    decoded = _html.unescape("".join(out))
    lines = []
    for line in decoded.split("\n"):
        line = _WS_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


#: Output schema for the extraction stage.
_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("extracted_text", T.StringType()),
    ]
)


def extract_text_udf():
    """Scalar Arrow-batched pandas UDF wrapping :func:`extract_text`."""

    @F.pandas_udf(T.StringType())
    def _extract(html: pd.Series) -> pd.Series:
        return html.map(extract_text)

    return _extract


def with_extracted_text(pages: DataFrame, *, html_col: str = "html") -> DataFrame:
    """Attach ``extracted_text`` to a pages frame (url-preserving)."""
    return pages.withColumn("extracted_text", extract_text_udf()(F.col(html_col)))


def extraction_parity(pages: DataFrame) -> DataFrame:
    """Audit frame: rows where extracted text ≠ stored ``text`` (must be
    empty — the north rule's byte-identical-per-url invariant)."""
    out = with_extracted_text(pages)
    return out.filter(~F.col("extracted_text").eqNullSafe(F.col("text"))).select(
        "url", "text", "extracted_text"
    )
