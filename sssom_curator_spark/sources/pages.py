"""Deterministic synthetic Common-Crawl-style pages (north-rule input).

BASELINE.json ``input_hint``: an Iceberg/Parquet table
``(url, warc_ts, html, text, lang)``. This generator is 100% column
expressions over ``spark.range`` — no driver data, no Python RNG — so it
scales to any row count, produces identical content at any parallelism
(values derive only from the row index via xxhash64), and the pages ship
with their ground-truth ``text`` so the extractor's byte-identical-per-url
invariant is testable at every scale.

Content design (FIXTURES.md §2):
- filler sentences from per-language vocabularies;
- ~50% of docs get one planted ontology-label mention (uniform over the
  label list), and ~10% get the designated HUB label — the skewed key that
  exercises salting in the grounding join;
- HTML wraps the text with boilerplate (nav/footer/menu/script/style)
  that the extractor must drop exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["generate_pages", "DEFAULT_LABELS", "HUB_LABEL", "VOCAB"]

VOCAB = {
    "en": (
        "the quick brown fox jumps over a lazy dog while many researchers "
        "study new data systems for large scale text processing and web "
        "analysis with modern tools that index billions of pages every day"
    ).split(),
    "de": (
        "der die das und ist nicht mit ein zu den viele forscher "
        "untersuchen neue daten systeme im netz jeden tag"
    ).split(),
    "es": (
        "el la de que y en un es los por muchos sistemas de datos web "
        "analizan paginas cada dia"
    ).split(),
}

#: Ontology labels planted into page text (normalized form, lowercase).
DEFAULT_LABELS = [
    "alpha tocopherol",
    "valencene",
    "glyoxal dioxime",
    "tyramine sulfate",
    "ethoxzolamide",
    "xanthan gum",
    "fluorothreonine",
    "visnadin",
]

#: The skewed hub label (MeSH/UMLS-style high-frequency term).
HUB_LABEL = "aspirin"


def _pick(arr_lit: Column, h: Column) -> Column:
    return F.element_at(arr_lit, (F.pmod(h, F.size(arr_lit)) + 1).cast("int"))


def generate_pages(
    spark: SparkSession,
    n: int,
    *,
    start: int = 0,
    labels: list[str] | None = None,
    hub_label: str = HUB_LABEL,
    mention_rate_pct: int = 50,
    hub_rate_pct: int = 10,
    n_sentences: int = 3,
    words_per_sentence: int = 8,
) -> DataFrame:
    """Build the pages DataFrame; deterministic in the parameters only.

    ``n_sentences`` sizes the document body. Tests use the small default;
    the scaling benchmark generates realistically-sized pages (real CC
    records carry KBs of text, and an overhead-dominated 200-byte corpus
    cannot evidence parallel scaling). Sentences are built with
    ``transform``/``sequence`` higher-order functions so the expression
    tree stays O(1) in document length.
    """
    if n_sentences < 1 or words_per_sentence < 1:
        # F.sequence(0, -1) defaults to step -1 and yields [0, -1] —
        # garbage sentences instead of an empty body.
        raise ValueError(
            "n_sentences and words_per_sentence must be >= 1 "
            f"(got {n_sentences}, {words_per_sentence})"
        )
    labels = labels or DEFAULT_LABELS
    # `start` shards the deterministic corpus: pages [start, start+n) are
    # identical whether generated here or as part of a larger range —
    # content derives only from the row index. Executor-sharded runs
    # (bench executors mode) give each worker JVM a disjoint range whose
    # union IS the full corpus.
    base = spark.range(start, start + n).select(F.col("id").alias("i"))

    def h(*salts: int) -> Column:
        cols = [F.col("i")] + [F.lit(s) for s in salts]
        return F.abs(F.xxhash64(*cols))

    # language: 80% en, 10% de, 10% es
    lang = (
        F.when(F.pmod(h(1), 10) < 8, F.lit("en"))
        .when(F.pmod(h(1), 10) < 9, F.lit("de"))
        .otherwise(F.lit("es"))
    )
    df = base.withColumn("lang", lang)

    # per-language vocabulary array, resolved once per row
    vocab = (
        F.when(F.col("lang") == "en", F.array(*map(F.lit, VOCAB["en"])))
        .when(F.col("lang") == "de", F.array(*map(F.lit, VOCAB["de"])))
        .otherwise(F.array(*map(F.lit, VOCAB["es"])))
    )
    df = df.withColumn("_vocab", vocab)

    # body: n_sentences × words_per_sentence words, each picked by a
    # position-keyed hash — one nested transform, not an unrolled loop.
    body = F.transform(
        F.sequence(F.lit(0), F.lit(n_sentences - 1)),
        lambda s: F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(words_per_sentence - 1)),
                lambda w: _pick(
                    F.col("_vocab"), F.abs(F.xxhash64(F.col("i"), F.lit(100), s, w))
                ),
            ),
            " ",
        ),
    )
    df = df.withColumn("_body", body)

    label_arr = F.array(*map(F.lit, labels))
    mention = F.when(
        F.pmod(h(2), 100) < hub_rate_pct, F.lit(hub_label)
    ).when(F.pmod(h(3), 100) < mention_rate_pct, _pick(label_arr, h(4)))
    mention_sentence = F.when(
        mention.isNotNull(), F.concat(F.lit("we discuss "), mention, F.lit(" in detail"))
    )

    # title, first body sentence, the (optional) mention, remaining body
    rest = (
        F.slice(F.col("_body"), 2, n_sentences - 1)
        if n_sentences > 1
        else F.array().cast("array<string>")
    )
    lines = F.array_compact(
        F.concat(
            F.array(
                F.concat(F.lit("Doc "), F.col("i").cast("string")),
                F.element_at(F.col("_body"), 1),
                mention_sentence,
            ),
            rest,
        )
    )
    text = F.array_join(lines, "\n")
    df = df.withColumn("text", text).withColumn("_lines", lines)

    # HTML: title = first line; body paragraphs = remaining lines;
    # boilerplate that the extractor must strip byte-exactly.
    paragraphs = F.array_join(
        F.transform(
            F.slice(F.col("_lines"), 2, F.greatest(F.size("_lines") - 1, F.lit(0))),
            lambda l: F.concat(F.lit("<p>"), l, F.lit("</p>")),
        ),
        "",
    )
    html_str = F.concat(
        F.lit("<html><head><title>"),
        F.element_at(F.col("_lines"), 1),
        F.lit("</title><style>p { margin: 0; }</style>"),
        F.lit("<script>var t = 1 < 2;</script></head><body>"),
        F.lit('<nav class="topnav">Home | About</nav>'),
        F.lit('<div id="cookie-banner">We use cookies</div>'),
        paragraphs,
        F.lit("<!-- tracking --><footer>&copy; example.org</footer>"),
        F.lit("</body></html>"),
    )
    out = df.select(
        F.concat(F.lit("https://example.org/page/"), F.col("i").cast("string")).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=F.pmod(h(5), 86400 * 30).cast("double"))
        ).alias("warc_ts"),
        html_str.cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    # Identity mapInPandas = a hard stage boundary. Without it, AQE's
    # logical re-optimization can collapse a downstream scalar pandas UDF
    # (e.g. the extractor) INTO this generator projection after
    # ExtractPythonUDFs has already run, leaving an unplannable PythonUDF
    # inside a plain Project ("Cannot generate code for expression:
    # _extract(...)" — flaky, repartition-dependent). Real corpora come
    # from parquet/Iceberg scans, which are natural barriers; the
    # generator needs an explicit one.
    def _identity(batches):
        yield from batches

    return out.mapInPandas(_identity, schema=out.schema)
