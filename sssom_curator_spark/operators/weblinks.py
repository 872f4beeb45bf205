"""Web-graph construction from raw HTML: link extraction and the
domain-level link graph.

The reference never touches HTML (its inputs are curated TSV mappings);
a Common-Crawl-scale KG pipeline starts here — anchor text is a primary
entity-linking signal, and the domain link graph feeds authority scoring
(:func:`sssom_curator_spark.graph.pagerank.pagerank`) and crawl-frontier
prioritization.

Everything is whole-stage-codegen column algebra: ``regexp_extract_all``
pulls the anchor tags, a ``transform`` lambda splits each tag into
(href, anchor) WITHOUT re-running the scan regex per element (the
pattern runs once per tag string, not per character of the page), and
``posexplode`` emits one row per link with its in-page position. No
Python anywhere.

Scale shape: extraction is pure map-side (explode factor = links per
page, bounded in practice; a link farm inflates only its own partition
and AQE rebalances post-shuffle consumers). The domain graph is one
groupBy on (src_domain, dst_domain) whose ``countDistinct`` plans as the
hub-safe two-shuffle expand — a million-page domain pair cannot hot-key
a reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sssom_curator_spark.functions.url_ops import registered_domain

__all__ = [
    "DEFAULT_LINK_PATTERN",
    "anchor_entity_candidates",
    "extract_links",
    "link_graph",
]

#: One capture for the href, one for the anchor text. Anchors are matched
#: as ``[^<]*`` (no nested markup) — nested-tag anchors simply don't
#: match, they are never mis-parsed. RE2-safe (no backreferences), so the
#: DuckDB oracle replays it verbatim.
DEFAULT_LINK_PATTERN = r'<a\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>'


def extract_links(
    pages: DataFrame,
    *,
    url_col: str = "url",
    html_col: str = "html",
    pattern: str = DEFAULT_LINK_PATTERN,
) -> DataFrame:
    """``(url, pos, href, anchor)`` — one row per anchor tag, in page
    order (``pos`` is 0-based). Pages without links emit no rows; a
    ``binary`` html column is decoded as UTF-8 (the input_hint schema
    carries html as binary)."""
    html = F.col(html_col).cast("string")
    tags = F.regexp_extract_all(html, F.lit(pattern), F.lit(0))
    return (
        pages.select(
            F.col(url_col).alias("url"),
            F.posexplode(
                F.transform(
                    tags,
                    lambda t: F.struct(
                        F.regexp_extract(t, pattern, 1).alias("href"),
                        F.regexp_extract(t, pattern, 2).alias("anchor"),
                    ),
                )
            ).alias("pos", "_l"),
        )
        .select("url", "pos", F.col("_l.href").alias("href"), F.col("_l.anchor").alias("anchor"))
    )


def link_graph(
    links: DataFrame,
    *,
    url_col: str = "url",
    href_col: str = "href",
) -> DataFrame:
    """Domain-level link graph from an extracted link table:
    ``(src_domain, dst_domain, n_links, n_pages)``. Malformed endpoints
    group under NULL domains so dirty links stay visible. Self-domain
    edges are kept (intra-site navigation is real signal; filter
    downstream if ranking)."""
    return (
        links.select(
            registered_domain(url_col).alias("src_domain"),
            registered_domain(href_col).alias("dst_domain"),
            F.col(url_col).alias("_page"),
        )
        .groupBy("src_domain", "dst_domain")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("_page").alias("n_pages"),
        )
    )


def anchor_entity_candidates(
    links: DataFrame,
    index: DataFrame,
    *,
    anchor_col: str = "anchor",
    href_col: str = "href",
) -> DataFrame:
    """Entity-linking prior from anchor text: how often the web links to
    each target domain USING each ontology term as the anchor — the
    web-graph analogue of the reference's lexical grounding
    (predict/lexical.py:83-160), and a standard disambiguation feature
    (anchor text is the strongest free-text label signal a crawl has).

    ``index`` is the grounding dimension ``(prefix, identifier,
    norm_text)`` — the same shape every grounding operator here consumes.
    Anchors are normalized with the shared
    :func:`~sssom_curator_spark.functions.text_norm.norm_text_col` rule,
    so "Alpha-Tocopherol " and "alpha tocopherol" ground identically.

    Output: ``(dst_domain, object_id, n_links)``.

    Scale shape: the index is a label dimension — AQE broadcasts it, so
    the link stream is matched map-side and a hub term (the MeSH/UMLS
    skew case) never concentrates a shuffle; the counting groupBy keys on
    (domain, object) pairs, which spreads a hub term across its target
    domains.
    """
    from sssom_curator_spark.functions.text_norm import norm_text_col

    dim = index.select(
        F.col("norm_text").alias("_nt"),
        F.concat_ws(":", F.col("prefix"), F.col("identifier")).alias("object_id"),
    )
    return (
        links.select(
            registered_domain(href_col).alias("dst_domain"),
            norm_text_col(F.col(anchor_col)).alias("_na"),
        )
        .join(dim, on=F.col("_na") == F.col("_nt"))
        .groupBy("dst_domain", "object_id")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
