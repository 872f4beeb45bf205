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

__all__ = ["canonicalize_url", "url_dedup"]

#: query parameters that never affect content identity
TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=")


def canonicalize_url(col: Column | str) -> Column:
    """Canonical URL string (see module docstring for the exact steps)."""
    raw = F.trim(F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit("")))
    u = F.substring_index(raw, "#", 1)  # 1. fragment

    pre_q = F.substring_index(u, "?", 1)
    query = u.substr(F.length(pre_q) + 2, F.length(u))  # '' when no '?'

    scheme = F.lower(F.substring_index(pre_q, "://", 1))
    rest = pre_q.substr(F.length(scheme) + 4, F.length(pre_q))
    hostport = F.substring_index(rest, "/", 1)
    path = rest.substr(F.length(hostport) + 1, F.length(rest))  # keeps leading '/'

    host = F.lower(F.substring_index(hostport, ":", 1))
    port = hostport.substr(F.length(host) + 2, F.length(hostport))
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    host_norm = F.when(default_port, host).otherwise(F.concat(host, F.lit(":"), port))

    path_norm = F.regexp_replace(path, r"/+$", "")

    keep = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.startswith(TRACKING_PREFIXES[0])
            & ~p.startswith(TRACKING_PREFIXES[1])
            & ~p.startswith(TRACKING_PREFIXES[2]),
        )
    )
    query_norm = F.when(
        F.size(keep) > 0, F.concat(F.lit("?"), F.array_join(keep, "&"))
    ).otherwise(F.lit(""))

    canonical = F.concat(scheme, F.lit("://"), host_norm, path_norm, query_norm)
    # malformed (no '://' outside the fragment) → trimmed passthrough;
    # still idempotent: the passthrough never introduces a '://'
    return F.when(u.contains("://"), canonical).otherwise(raw)


def url_dedup(
    pages: DataFrame, *, url_col: str = "url", id_col: str | None = None
) -> DataFrame:
    """URL-keyed exact dedup: keep EXACTLY one page per canonical URL.

    The winner is the minimum ``id_col`` (default: the raw URL string, so
    re-crawled case/tracking variants collapse to the lexicographically
    first raw form); ties on ``id_col`` — the same raw URL re-crawled —
    break on a content hash of the full row, so the winner is
    deterministic whenever the tied rows differ anywhere, and exactly one
    of a set of fully-identical rows survives. One shuffle on the
    canonical key (the window), same posture as
    :func:`sssom_curator_spark.operators.dedup.exact_dedup`.
    """
    from pyspark.sql import Window

    key = id_col or url_col
    tagged = pages.withColumn("_curl", canonicalize_url(url_col))
    w = Window.partitionBy("_curl").orderBy(
        F.col(key).asc(), F.xxhash64(F.struct(*pages.columns)).asc()
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_curl", "_rn")
    )
