"""Capture .explain("formatted") output for declared queries.

Usage::

    python tools/capture_plans.py before [query ...]
    python tools/capture_plans.py after  [query ...]

Writes ``plans/r06/<query>_<tag>.txt``. Default query set = every entry the
frozen bench times (the 75-query list + kg_pipeline is excluded: it is a
multi-output pipeline, not a single frame). NOTE: some queries execute
eager sub-jobs (localCheckpoint / collect) during construction — capture is
therefore not free, but it is exactly what the bench pays before the noop
write.
"""

from __future__ import annotations

import os
import sys

BENCH_QUERIES = [
    "grounding_join", "prefix_pair_counts", "conjunctive_filter",
    "window_topn", "tumbling_window", "hopping_window", "session_window",
    "cohort_retention", "funnel", "rate_anomaly", "asof_join", "range_join",
    "hypertable_rollup", "kmins_distinct", "exact_quantiles",
    "connected_components", "degree_histogram", "k_core", "assortativity",
    "transitive_closure", "bounded_reachability", "pagerank",
    "personalized_pagerank", "triangle_counts", "hits",
    "domain_rank_weighted", "neighbor_jaccard", "label_propagation",
    "extract_links", "domain_rank", "anchor_grounding", "exact_dedup_docs",
    "minhash_lsh", "ngram_jaccard", "simhash_neardup", "ann_topk",
    "ann_lsh", "ann_ivf", "embedding_neardup", "embedding_simjoin",
    "langid_quality", "corpus_card", "fingerprint", "token_count_bpe",
    "repetition_stats", "decontaminate", "paragraph_dedup",
    "dup_span_stats", "url_canonicalize", "crawl_merge", "crawl_diff",
    "near_dedup_apply", "domain_stats", "hash_split", "stratified_sample",
    "group_topk_sample", "weighted_sample", "mixture_weights",
    "pack_sequences", "chunk_documents", "pii_redact", "vocab_stats",
    "unigram_logprob", "bigram_pmi", "zipf_fit", "tfidf_topk", "bpe_pairs",
    "bpe_train", "bpe_encode", "kmeans", "dsir_weights",
    "mention_candidates", "comention_edges", "edit_distance_pairs",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    names = only or BENCH_QUERIES

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from sssom_curator_spark.session import get_spark

    import __spark_entry__ as entrymod

    if os.environ.get("PLANS_NO_CKPT") == "1":
        # Operators that end in an eager localCheckpoint capture as a bare
        # "Scan ExistingRDD" (the checkpoint truncates the plan — that IS
        # the shipped execution shape, but it hides the interior). This
        # mode no-ops localCheckpoint so the full composed plan is visible;
        # the resulting files carry a _full suffix and are documentation
        # only — the runtime plan is the checkpointed one.
        from pyspark.sql import DataFrame

        DataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore[assignment]
        try:  # Spark 4: the concrete classic class overrides the base ABC
            from pyspark.sql.classic.dataframe import DataFrame as _CDF

            _CDF.localCheckpoint = lambda self, eager=True: self  # type: ignore[assignment]
        except ImportError:
            pass

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"plans-{tag}", master="local[8]")
    qs = entrymod.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record the failure, keep going
            text = f"EXPLAIN FAILED: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(text)
        print(f"{name}: {len(text)} chars")
    spark.stop()


if __name__ == "__main__":
    main()
