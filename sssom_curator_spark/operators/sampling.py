"""Deterministic hash-based sampling and train/val/test split assignment.

Not present in the reference (a curated-mapping repository has no notion
of corpus splits); these are the bread-and-butter selection operators of
a training-data pipeline, where ``df.sample()`` is the WRONG tool: its
output depends on partitioning and Spark's per-partition RNG stream, so
a re-run (or a recovered job) samples a different corpus. Everything
here keys on a salted md5 of the row's id — pure map-side codegen, no
shuffle, no state — so membership is a property of the ROW, stable
across re-runs, partitionings, cluster sizes, and engines (the DuckDB
oracle replays it with plain ``substr(md5(...))``).

Mechanism: the first 8 hex chars of ``md5(salt || '|' || id)`` are a
uniform 32-bit key; comparisons happen LEXICOGRAPHICALLY on fixed-width
lowercase hex (equal to numeric order), against thresholds precomputed
in Python as 8-hex-char literals — no base conversion on either engine.
Disjoint salts give independent selections; the same salt gives nested
ones (``fraction=0.1`` ⊂ ``fraction=0.2``), which is exactly the
reproducible-subset semantics scaling-law experiments need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hex_threshold",
    "unit_hex",
    "split_assign",
    "deterministic_sample",
    "stratified_sample",
    "mixture_weights",
    "pack_sequences",
    "chunk_documents",
    "group_topk_sample",
    "weighted_sample",
]


def hex_threshold(fraction: float) -> str:
    """``fraction`` of the 32-bit key space as an 8-hex-char literal —
    the comparison constant both Spark and the SQL oracle embed.

    ``fraction=1.0`` returns ``"g"``: every 8-hex key compares strictly
    below it (hex digits stop at ``f``), so keep-all really keeps ALL
    rows — a clamped ``"ffffffff"`` under the strict ``<`` would drop
    the ~1-in-4.3B rows hashing exactly to it (guaranteed losses at the
    100 TB design point)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * (1 << 32)), "08x")


def unit_hex(col: Column | str, *, salt: str) -> Column:
    """Salted uniform 32-bit key as fixed-width lowercase hex."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.md5(F.concat_ws("|", F.lit(salt), c.cast("string"))), 1, 8)


def split_assign(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hashed-id bucket.

    ``weights`` maps split name → relative weight (normalized; default
    ``{"train": 0.9, "val": 0.05, "test": 0.05}``). Assignment is a
    chained threshold compare on the salted key — one map-side
    projection; a row's split never changes under re-runs or
    repartitioning, and documents deduplicated upstream can't leak
    across splits by id.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    if len(weights) < 2:
        raise ValueError("need at least two splits")
    total = float(sum(weights.values()))
    key = unit_hex(id_col, salt=salt)
    names = list(weights)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        cond = key < F.lit(hex_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def deterministic_sample(
    df: DataFrame, fraction: float, *, id_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Keep a stable ``fraction`` of rows by hashed id. Nested under a
    shared salt: the 10% sample is a subset of the 20% sample. One
    map-side filter — at 100 TB this prunes before any downstream
    shuffle, and a resumed job selects the identical subset."""
    return df.filter(unit_hex(id_col, salt=salt) < F.lit(hex_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    strata_col: str,
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive
    (keep 100% of books, 30% of web, 5% of a boilerplate-heavy crawl).
    ``fractions`` maps stratum value → keep fraction; strata absent from
    the map (including NULL) keep ``default_fraction``. Same salted-key
    mechanism as :func:`deterministic_sample`, so per-stratum samples are
    nested under fraction changes and stable across re-runs. Pure
    map-side filter; unlike ``df.sampleBy`` there is no RNG and no
    partition dependence.
    """
    key = unit_hex(id_col, salt=salt)
    thr = F.lit(hex_threshold(default_fraction))
    expr = None
    for value, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(value)
        lit = F.lit(hex_threshold(frac))
        expr = F.when(cond, lit) if expr is None else expr.when(cond, lit)
    thr = expr.otherwise(thr) if expr is not None else thr
    return df.filter(key < thr)


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    bucket_hex_chars: int = 1,
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-chunk sequence packing offsets (GPT-style pretraining:
    documents are concatenated in a deterministic order and the token
    stream is sliced into fixed-``budget`` training sequences; documents
    straddle sequence boundaries). Emits, per document: its ``bucket``,
    the ``seq_id`` its first token lands in (bucket-qualified), and its
    ``offset`` within that sequence — everything a writer needs to
    materialize packed sequences without a second pass.

    Determinism + scale: a GLOBAL concatenation order is a single-reducer
    sort — the scale anti-pattern. Documents are instead salted into
    ``16**bucket_hex_chars`` independent buckets (one md5 prefix — the
    same portable key family as :func:`split_assign`) and concatenated
    per bucket in ``id_col`` order, so packing parallelizes across
    buckets, every bucket's layout is a pure function of row ids, and a
    re-run or a different partitioning yields byte-identical packing.
    One shuffle (the per-bucket window sort); the exclusive running sum
    is a plain window aggregate, ANSI-replayable.
    """
    from pyspark.sql import Window

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    bucket = F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))),
        1,
        bucket_hex_chars,
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(tokens_col).over(w), F.lit(0).cast("long"))
    out = df.withColumn("bucket", bucket).select(
        F.col(id_col),
        "bucket",
        F.concat_ws(
            "-", F.col("bucket"), F.floor(cum / budget).cast("string")
        ).alias("seq_id"),
        (cum % budget).cast("long").alias("offset"),
    )
    return out


def mixture_weights(
    stats: DataFrame,
    targets: dict[str, float],
    *,
    group_col: str = "domain",
    size_col: str = "n_tokens",
    round_scale: int = 9,
) -> DataFrame:
    """Corpus-mixing planner: per-group keep rates that realize a target
    mixture (e.g. 50% books / 30% web / 20% code by tokens) from measured
    per-group sizes — the step between :func:`domain_stats`-style
    aggregation and :func:`stratified_sample` application.

    ``targets`` maps group value → desired share (normalized). The plan
    downsamples only (no rate exceeds 1): the binding group is the one
    with the smallest ``size/share``, every other group is cut to match
    its proportion, so total kept volume is the maximum achievable for
    the requested mixture. Emits ``(group_col, target_frac, keep_rate,
    kept_size)``; feed ``keep_rate`` per group into
    :func:`stratified_sample`. Groups absent from ``targets`` keep 0 (use
    ``default_fraction`` downstream) and are omitted here, as are target
    groups missing from ``stats`` (nothing to keep).

    Scale shape: ``stats`` is a group-level dimension (domains or
    sources, never documents), so the literal target frame broadcasts
    and the binding-constraint minimum is one unpartitioned window over
    dim-sized data — the corpus is never touched. Determinism: target
    shares are normalized in PYTHON and embedded as literals, and both
    engines evaluate the same IEEE-double expressions in the same shape,
    so the DuckDB oracle replays rates exactly; ``keep_rate`` is
    nearest-quantized at 1e-9 via ``floor(x*1e9 + 0.5)`` — pure double
    arithmetic, exact everywhere (no decimal rounding-mode coupling),
    and the binding group's rate lands on exactly 1.0 despite the
    ``(size/t)*t/size`` float dip.
    """
    import pandas as pd

    total = float(sum(targets.values()))
    if total <= 0 or any(v < 0 for v in targets.values()):
        raise ValueError("targets must be non-negative with a positive sum")
    from pyspark.sql import Window

    tgt = stats.sparkSession.createDataFrame(
        pd.DataFrame(
            {group_col: list(targets), "_t": [v / total for v in targets.values()]}
        )
    )
    everything = Window.partitionBy()
    joined = stats.join(F.broadcast(tgt), on=group_col, how="inner").filter(
        F.col("_t") > 0
    )
    c = F.min(F.col(size_col) / F.col("_t")).over(everything)
    q = float(10 ** round_scale)
    # nearest-quantization via floor(x*q + 0.5): pure double arithmetic,
    # identical in every engine (unlike decimal round()), and it repairs
    # the binding group's (size/t)*t/size float dip below exact 1.0
    return joined.select(
        group_col,
        F.col("_t").alias("target_frac"),
        (F.floor(c * F.col("_t") / F.col(size_col) * q + 0.5) / q).alias("keep_rate"),
        F.floor(c * F.col("_t") + 0.5).cast("long").alias("kept_size"),
    )


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window chunking — the context-window preparation step of a
    pretraining pipeline: split each document's whitespace token stream
    into chunks of at most ``max_tokens`` tokens, consecutive chunks
    sharing ``overlap`` tokens (stride = max_tokens - overlap). The last
    chunk may be shorter; token-less documents emit no chunks. Tokens
    keep their original case (chunking is a layout operation, not a
    normalization — :func:`~sssom_curator_spark.operators.textstats.norm_words`
    is for statistics).

    Output: ``(doc_id, chunk_id, n_chunk_tokens, chunk_text)`` with
    0-based ``chunk_id`` in document order.

    Scale shape: pure map-side projection — tokenize once into a bound
    array column, compute the chunk count arithmetically, explode a
    ``sequence`` of chunk ids, slice per chunk. No shuffle, no Python;
    the explode factor is ~n_tokens/stride (bounded by document length,
    which upstream length filters already cap).
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"need 0 <= overlap < max_tokens, got overlap={overlap} "
            f"max_tokens={max_tokens}"
        )
    stride = max_tokens - overlap
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"), lambda w: w != ""
    )
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("_t")).select(
        "doc_id",
        "_t",
        F.size("_t").alias("_n"),
    )
    n = F.col("_n")
    n_chunks = (
        F.when(n == 0, F.lit(0))
        .when(n <= max_tokens, F.lit(1))
        .otherwise(
            F.lit(1)
            + F.floor((n - max_tokens + F.lit(stride - 1)) / F.lit(stride)).cast("long")
        )
    )
    # guard: Spark's sequence(0, -1) DESCENDS — empty docs must map to an
    # empty id array, not [0, -1]
    ids = F.when(
        n_chunks > 0, F.sequence(F.lit(0).cast("long"), n_chunks.cast("long") - 1)
    ).otherwise(F.array().cast("array<long>"))
    exploded = base.select("doc_id", "_t", F.explode(ids).alias("chunk_id"))
    piece = F.slice(F.col("_t"), (F.col("chunk_id") * stride + 1).cast("int"), max_tokens)
    return exploded.select(
        "doc_id",
        "chunk_id",
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def group_topk_sample(
    df: DataFrame,
    *,
    group_cols: list[str],
    id_col: str = "doc_id",
    k: int = 10,
    salt: str = "gk",
) -> DataFrame:
    """Exactly ``min(k, group size)`` rows per group, selected by salted
    md5 order — the eval-set/inspection-sample constructor
    (:func:`stratified_sample` keeps a FRACTION per group; audits and
    few-shot pools need an exact COUNT). Deterministic across reruns,
    partitionings, and engines (the same portable key family as
    :func:`split_assign`); ``id_col`` breaks ties between duplicated ids.

    Scale shape: ONE shuffle on the group key plus a per-group sort
    (``row_number`` window). A pathologically hot group lands on one
    reducer and pays a sort of its own rows — acceptable when groups are
    domains/languages (crawl-bounded); for a group that is itself
    corpus-sized, pre-thin with :func:`deterministic_sample` on the same
    salt before the exact pass.
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    key = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(*group_cols).orderBy(key, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    *,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — pick ``k``
    rows with probability proportional to ``weight_col`` (the
    Efraimidis–Spirakis A-ES scheme: order by ``ln(u)/w`` with one
    uniform ``u`` per row and keep the top k). The "randomness" is the
    salted-md5 uniform of :func:`unit_hex`, so — like every selector in
    this module — the sample is a pure function of row ids: re-runs,
    repartitioning, and engines agree. The natural consumer is
    importance-weighted data selection (feed DSIR weights in).

    Rows with NULL or non-positive weights are excluded. Returns the
    selected rows with all input columns.

    Scale shape: the key is one map-side projection; selection is a
    global top-k — ``TakeOrderedAndProject`` (per-partition heaps, one
    k-sized driver merge), never a full sort.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    # (h + 0.5)/2^32 keeps u strictly INSIDE (0, 1): h = 2^32 - 1 under
    # the +1 form gives u = 1.0 and key ln(1)/w = 0 — the global maximum
    # REGARDLESS of weight, so ~1-in-4.3B rows would deterministically
    # hijack the sample at the design scale (review finding, round 5)
    u = (
        F.conv(unit_hex(id_col, salt=salt), 16, 10).cast("double") + F.lit(0.5)
    ) / F.lit(float(1 << 32))
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_es_key", key)
        .orderBy(F.desc("_es_key"), F.col(id_col))
        .limit(k)
        .drop("_es_key")
    )
