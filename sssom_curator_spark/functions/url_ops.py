"""URL canonicalization — the dedup key normalizer of a Common-Crawl-style
pipeline (pages are re-crawled under ``HTTP://Host/path/?utm_source=…``
variants; canonicalizing before URL-keyed dedup collapses them).

Not present in the reference (its identifiers are CURIEs — see
:mod:`sssom_curator_spark.functions.curie_ops` for that family); sibling
of the corpus-hygiene operators in ``operators/``. Pure column
expressions — whole-stage codegen, ANSI-SQL replayable (the DuckDB oracle
rebuilds the same steps), no Python anywhere.

Canonical form, applied to ``scheme://host[:port]/path?query`` inputs
(fragments allowed). Raw crawl URL columns routinely contain malformed
entries; anything WITHOUT a ``://`` passes through trimmed-but-unchanged
(treating the whole string as a scheme would emit ``<input>://`` keys and
spuriously collide distinct garbage). For the well-formed rest:

1. trim; drop the ``#fragment``;
2. lowercase the scheme and the host (path/query case is significant and
   preserved);
3. drop a default port (``:80`` for http, ``:443`` for https; other ports
   kept);
4. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``) and empty
   params, sort the survivors bytewise (param order is not semantic), and
   drop the ``?`` entirely when none survive;
5. strip trailing slashes from the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "canonicalize_url",
    "url_dedup",
    "crawl_merge",
    "crawl_diff",
    "url_host",
    "registered_domain",
    "domain_stats",
    "filter_blocklisted_domains",
]

#: query parameters that never affect content identity
TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=")


def _part(u: Column, part: str) -> Column:
    """One URL component via the built-in ``try_parse_url`` (JVM-side
    ``java.net.URI`` parse; NULL on malformed input instead of throwing)."""
    return F.try_parse_url(u, F.lit(part))


def canonicalize_url(col: Column | str) -> Column:
    """Canonical URL string (see module docstring for the exact steps).

    Implementation note (perf): components come from the built-in
    ``try_parse_url`` expression, ONE tiny plan node per component,
    instead of hand-rolled ``substring_index``/``substr`` chains. Column
    expressions are unshared trees — every reference to a derived string
    re-inlines its whole subtree, so the chained form ballooned the plan
    to the point that Catalyst analysis + codegen dominated the query
    (~26 s *constant* overhead regardless of data size, measured at both
    sf0.01 and sf0.1). With ``try_parse_url`` the whole canonicalizer is
    ~a dozen small nodes and the bench row is execution-bound again.

    Malformed inputs (``java.net.URI`` rejects them, or no scheme/host —
    raw crawl URL columns routinely contain such entries) pass through
    trimmed-but-unchanged via ``coalesce``: ``concat`` propagates the
    NULL scheme/host. Still idempotent — the passthrough never
    introduces a parseable URL. Userinfo (``user:pw@host``) is dropped
    from the canonical form (out of contract; it never identifies
    distinct content).
    """
    raw = F.trim(F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit("")))
    u = F.substring_index(raw, "#", 1)  # 1. drop the fragment

    scheme = F.lower(_part(u, "PROTOCOL"))  # NULL when malformed/schemeless
    # host comes from AUTHORITY (strip userinfo + trailing ':digits'), not
    # the HOST part: java.net.URI's getHost() is RFC-2396-strict and
    # returns NULL for e.g. digit-leading top labels ('http://0.0/'),
    # which are routine in raw crawl URLs; AUTHORITY is still populated
    auth = _part(u, "AUTHORITY")  # NULL when malformed → passthrough
    host = F.lower(F.regexp_replace(auth, r"^[^@/]*@|:\d+$", ""))
    port = F.regexp_extract(F.coalesce(auth, F.lit("")), r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    host_norm = F.when(default_port, host).otherwise(F.concat(host, F.lit(":"), port))

    path_norm = F.regexp_replace(F.coalesce(_part(u, "PATH"), F.lit("")), r"/+$", "")

    from functools import reduce

    keep = F.array_sort(
        F.filter(
            F.split(F.coalesce(_part(u, "QUERY"), F.lit("")), "&"),
            lambda p: reduce(
                lambda acc, pref: acc & ~p.startswith(pref),
                TRACKING_PREFIXES,
                p != "",
            ),
        )
    )
    query_norm = F.when(
        F.size(keep) > 0, F.concat(F.lit("?"), F.array_join(keep, "&"))
    ).otherwise(F.lit(""))

    # NULL scheme or host (malformed) nulls the concat → passthrough
    canonical = F.concat(scheme, F.lit("://"), host_norm, path_norm, query_norm)
    return F.coalesce(canonical, raw)


def _contains_map(dt) -> bool:
    """True when ``dt`` has a MapType anywhere inside — Spark's hash and
    ordering/comparison expressions both reject maps at analysis time."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def url_dedup(
    pages: DataFrame, *, url_col: str = "url", id_col: str | None = None
) -> DataFrame:
    """URL-keyed exact dedup: keep EXACTLY one page per canonical URL.

    The winner is the minimum ``id_col`` (default: the raw URL string, so
    re-crawled case/tracking variants collapse to the lexicographically
    first raw form); ties on ``id_col`` — the same raw URL re-crawled —
    break on the remaining row content, so the winner is deterministic
    whenever the tied rows differ anywhere comparable, and exactly one of
    a set of fully-identical rows survives.

    Scale shape: ONE shuffle on the canonical key as a two-phase
    ``groupBy(min(struct(key, row)))`` aggregation — the minimum combines
    MAP-SIDE, so each upstream partition ships at most one candidate row
    per canonical URL and a pathologically re-crawled URL (the same page
    captured millions of times) costs its reducer O(partitions), not
    O(duplicates). The previous ``row_number`` window form concentrated
    every duplicate of a hot URL on one reducer.

    Frames with map-typed columns (anywhere nested) take a fallback path
    — Spark cannot hash or order maps — that selects winner keys by the
    same two-phase minimum over the NON-map columns and resolves them
    with a semi-join: still skew-safe, but among rows differing ONLY in
    map columns the survivor is an arbitrary (not content-deterministic)
    one.
    """
    key = id_col or url_col
    tagged = pages.withColumn("_curl", canonicalize_url(url_col))
    no_maps = [f.name for f in pages.schema.fields if not _contains_map(f.dataType)]
    if len(no_maps) == len(pages.columns):
        # struct minima compare field-by-field: key first, then the full
        # row — fully deterministic, and identical rows collapse to one
        winner = tagged.groupBy("_curl").agg(
            F.min(
                F.struct(F.col(key).alias("_k"), F.struct(*pages.columns).alias("_r"))
            ).alias("_w")
        )
        return winner.select("_w._r.*")
    winners = tagged.groupBy("_curl").agg(
        F.min(
            F.struct(
                F.col(key).alias("_k"),
                F.xxhash64(F.struct(*no_maps)).alias("_h"),
            )
        ).alias("_w")
    )
    resolved = tagged.join(
        winners,
        on=[
            tagged["_curl"] == winners["_curl"],
            # eqNullSafe: a NULL winning key (struct minima treat NULL as
            # smallest) must still match its own row — plain == is NULL
            # there and would silently DROP the whole group
            F.col(key).eqNullSafe(F.col("_w._k")),
            F.xxhash64(F.struct(*[tagged[c] for c in no_maps])) == F.col("_w._h"),
        ],
        how="left_semi",
    )
    # rows surviving the semi-join tie on every comparable column; keep one
    return resolved.dropDuplicates(["_curl"]).drop("_curl")


def url_host(col: Column | str) -> Column:
    """Lowercased host of a URL (port dropped), NULL for malformed inputs
    (no ``://``). Pure column expression; composes with
    :func:`canonicalize_url` output or raw crawl URLs alike."""
    u = F.trim(F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit("")))
    auth = _part(F.substring_index(u, "#", 1), "AUTHORITY")
    host = F.lower(F.regexp_replace(auth, r"^[^@/]*@|:\d+$", ""))
    return F.when(host != "", host)


def registered_domain(col: Column | str) -> Column:
    """Registered domain of a URL: the last two dot-labels of the host
    (``www.shop.com`` → ``shop.com``), NULL for malformed inputs.

    This is the two-label HEURISTIC: correct for generic TLDs, one label
    short for public-suffix country registrations (``example.co.uk`` →
    ``co.uk``). A production pipeline swaps in a broadcast public-suffix
    table (the ``publicsuffix2`` dataset, not in this container); the
    grouping/joining shape downstream is identical.
    """
    host = url_host(col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2, F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    ).otherwise(host)


def domain_stats(
    pages: DataFrame, *, url_col: str = "url", text_col: str | None = None
) -> DataFrame:
    """Per-registered-domain corpus statistics — the aggregation behind
    domain-level curation decisions (crawl pipelines score and blocklist
    whole domains, not pages): page count, distinct canonical URLs, and
    (when ``text_col`` is given) mean text length.

    Malformed URLs group under a NULL domain so they stay visible in the
    report instead of vanishing.

    Scale shape: one ``groupBy(domain)`` with ``countDistinct`` on the
    canonical URL — Spark plans the distinct as the two-shuffle expand
    whose first exchange keys on (domain, canonical-url), so a
    million-page domain spreads across reducers during dedup-counting and
    only its final per-domain merge row converges (the same hot-key-safe
    shape plan-asserted for paragraph dedup in ``tests/test_plans.py``).
    """
    # domain is derived from the CANONICAL url (host-preserving), not the
    # raw one: the canonical string is computed once per row anyway for
    # n_urls, and re-parsing it is cheaper than running the full
    # canonicalization expression chain a second time for the host.
    tagged = pages.select(
        canonicalize_url(url_col).alias("_curl"),
        *([F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("_len")] if text_col else []),
    ).withColumn("domain", registered_domain("_curl"))
    aggs = [
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("_curl").alias("n_urls"),
    ]
    if text_col:
        aggs.append(F.round(F.avg("_len"), 6).alias("avg_chars"))
    return tagged.groupBy("domain").agg(*aggs)


def filter_blocklisted_domains(
    pages: DataFrame,
    blocklist: DataFrame,
    *,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop every page whose registered domain appears in ``blocklist``
    (a one-column frame of domains). One ``left_anti`` equi-join; the
    blocklist is a dimension (thousands to millions of rows, bounded by
    the domain population, not the corpus) — AQE broadcasts it, so the
    corpus is filtered map-side without a shuffle."""
    return pages.join(
        blocklist.select(F.col(domain_col).alias("_bdom")),
        on=registered_domain(url_col) == F.col("_bdom"),
        how="left_anti",
    )


def crawl_merge(
    snapshots: DataFrame,
    fresh: DataFrame,
    *,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Incremental crawl refresh: union the standing corpus with a new
    crawl and keep EXACTLY the newest capture per canonical URL — the
    recurring maintenance job of a Common-Crawl-style pipeline (each
    monthly crawl re-captures most URLs; the corpus must converge to one
    fresh row per page without reprocessing history).

    The winner is the MAXIMUM ``ts_col``; ties (same URL captured twice
    in one crawl second) break on the remaining row content
    (struct-lexicographic, like :func:`url_dedup`), so the survivor is
    deterministic and exactly one of a set of fully-identical rows
    remains. Both inputs must share a schema (``unionByName``).

    Scale shape: ONE shuffle on the canonical key as a two-phase
    ``groupBy(max(struct(ts, row)))`` — the maximum combines MAP-SIDE,
    so each upstream partition ships at most one candidate per canonical
    URL and a URL captured in every crawl for a decade costs its reducer
    O(partitions), not O(captures). Run incrementally (standing corpus +
    one new crawl), the standing side is already unique per key, so the
    map-side combine degenerates to a pass-through there and the real
    work is proportional to the NEW crawl. Frames with map-typed columns
    take the same hashed-winner fallback as :func:`url_dedup`.
    """
    all_rows = snapshots.unionByName(fresh)
    cols = all_rows.columns
    tagged = all_rows.withColumn("_curl", canonicalize_url(url_col))
    no_maps = [f.name for f in all_rows.schema.fields if not _contains_map(f.dataType)]
    if len(no_maps) == len(cols):
        winner = tagged.groupBy("_curl").agg(
            F.max(
                F.struct(F.col(ts_col).alias("_ts"), F.struct(*cols).alias("_r"))
            ).alias("_w")
        )
        return winner.select("_w._r.*")
    winners = tagged.groupBy("_curl").agg(
        F.max(
            F.struct(
                F.col(ts_col).alias("_ts"),
                F.xxhash64(F.struct(*no_maps)).alias("_h"),
            )
        ).alias("_w")
    )
    resolved = tagged.join(
        winners,
        on=[
            tagged["_curl"] == winners["_curl"],
            # eqNullSafe: all-NULL timestamps for a URL must still keep a
            # row (plain == would drop the whole group)
            F.col(ts_col).eqNullSafe(F.col("_w._ts")),
            F.xxhash64(F.struct(*[tagged[c] for c in no_maps])) == F.col("_w._h"),
        ],
        how="left_semi",
    )
    return resolved.dropDuplicates(["_curl"]).drop("_curl")


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    url_col: str = "url",
    content_col: str = "text",
) -> DataFrame:
    """Snapshot delta between two crawls: which canonical URLs were
    ``added``, ``removed``, or ``changed`` (content hash differs) — the
    report an incremental refresh pipeline emits before
    :func:`crawl_merge` commits, and the freshness signal crawl
    schedulers consume. Unchanged URLs are NOT emitted (the output is
    delta-sized, not corpus-sized).

    Each side is first collapsed to one row per canonical URL with the
    LEXICOGRAPHICALLY GREATEST content hash (dedup within a snapshot is
    :func:`url_dedup`'s job; the max makes this operator deterministic
    even on non-deduped inputs). Output:
    ``(url, status, old_hash, new_hash)`` with the canonical URL.

    Scale shape: one groupBy per side keyed on the canonical URL (the
    max combines map-side — a hot URL ships one candidate per upstream
    partition), then ONE full-outer equi-join of two already-keyed,
    URL-unique frames. Hashes (md5) travel, never page content.
    """

    def _side(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.select(
                canonicalize_url(url_col).alias("url"),
                F.md5(F.coalesce(F.col(content_col).cast("string"), F.lit(""))).alias(
                    alias
                ),
            )
            .groupBy("url")
            .agg(F.max(alias).alias(alias))
        )

    o = _side(old, "old_hash")
    n = _side(new, "new_hash")
    joined = o.join(n, on="url", how="full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select("url", "status", "old_hash", "new_hash")
    )
