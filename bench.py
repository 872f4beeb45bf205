"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric: end-to-end KG-construction throughput (docs/sec) over the
synthetic Common-Crawl-style pages table — the north-rule pipeline
(extract → mention → score → exclude → canonicalize). Per-query wall times
for the operator families ride along in ``queries``.

Scaling evidence (north rule: throughput efficiency ≥ 0.8 between N and
4N parallelism): ``python bench.py --scaling`` runs the same workload in
two fresh JVMs at local[8] and local[32] and writes BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


N_BENCH_PAGES = int(os.environ.get("BENCH_PAGES", "20000"))
# Real Common-Crawl records carry KBs of text; 200-byte toy docs make every
# stage fixed-overhead-dominated and cannot evidence parallel scaling.
N_BENCH_SENTENCES = int(os.environ.get("BENCH_SENTENCES", "30"))


def run_bench(sf_dir: str, cpus: int, *, pipeline_only: bool = False) -> dict:
    from pyspark.sql import functions as F

    from sssom_curator_spark.session import get_spark
    import __spark_entry__ as entrymod

    # shuffle width tracks core count (what a real cluster config does);
    # AQE coalesces the tail.
    spark = get_spark(
        app_name=f"bench-{cpus}",
        master=f"local[{cpus}]",
        extra={"spark.sql.shuffle.partitions": str(max(16, 2 * cpus))},
    )
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    timings: dict[str, float] = {}

    # warm the JVM + python workers once (excluded from timings)
    spark.range(1000).select(F.sum("id")).collect()

    qs = entrymod.queries()
    for name in () if pipeline_only else (
        "grounding_join",
        "prefix_pair_counts",
        "conjunctive_filter",
        "window_topn",
        "tumbling_window",
        "connected_components",
        "exact_dedup_docs",
        "minhash_lsh",
        "ngram_jaccard",
        "simhash_neardup",
        "ann_topk",
        "embedding_simjoin",
        "langid_quality",
        "fingerprint",
        "token_count_bpe",
        "mention_candidates",
    ):
        timings[name] = _timed(lambda n=name: qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save())

    # headline: end-to-end pipeline docs/sec on generated pages
    from sssom_curator_spark.pipeline import build_kg
    from sssom_curator_spark.sources.fixtures import seed_labels, seed_xrefs
    from sssom_curator_spark.sources.pages import generate_pages

    pages = generate_pages(spark, N_BENCH_PAGES, n_sentences=N_BENCH_SENTENCES).persist()
    n_pages = pages.count()

    def run_pipeline():
        out = build_kg(
            spark,
            pages,
            seed_labels(spark, hub_copies=25),
            xrefs=seed_xrefs(spark),
            materialize=False,  # throughput mode: one fused scan, no per-stage caches
        )
        out["mappings"].write.format("noop").mode("overwrite").save()
        out["components"].write.format("noop").mode("overwrite").save()
        out["mappings"].unpersist()

    pipeline_sec = _timed(run_pipeline)
    timings["kg_pipeline"] = pipeline_sec
    pages.unpersist()
    docs_per_sec = round(n_pages / pipeline_sec, 1)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "kg_pipeline_docs_per_sec",
        "value": docs_per_sec,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "total_sec": total,
        "cpus": cpus,
        "n_pages": n_pages,
    }
    spark.stop()
    return result


def run_scaling(sf_dir: str, levels=(8, 32)) -> None:
    """Run the bench in fresh subprocess JVMs at two parallelism levels and
    write BENCH.md with throughput + scaling efficiency. Pipeline-only and
    with a page count large enough that compute dominates task-scheduling
    overhead; runs are strictly serialized (one JVM at a time)."""
    import subprocess

    results = {}
    for cpus in levels:
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(cpus),
            BENCH_ONLY_PIPELINE="1",
            BENCH_PAGES=os.environ.get("BENCH_PAGES", "60000"),
        )
        out = subprocess.run(
            [sys.executable, __file__],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)

    lo, hi = levels
    thr_lo, thr_hi = results[lo]["value"], results[hi]["value"]
    # efficiency of scaling N→4N: actual speedup / ideal speedup
    efficiency = round((thr_hi / thr_lo) / (hi / lo), 3)
    ratio = round(thr_hi / thr_lo, 2)
    lines = [
        "# BENCH — scaling evidence (sandbox proxy for N vs 4N executors)",
        "",
        f"Same input ({results[lo]['n_pages']} synthetic CC-style pages, "
        f"end-to-end KG pipeline: filter -> extract -> mention -> score -> "
        f"exclude -> canonicalize), same code, two parallelism levels in "
        f"fresh serialized JVMs. North-rule criterion: throughput scaling "
        f"efficiency >= 0.8 between N and 4N parallelism; on one shared-"
        f"memory host local[8]->local[32] shares a memory bus and page "
        f"cache, so this is the conservative lower bound of what separate "
        f"executors would show.",
        "",
        "| parallelism | pipeline docs/sec | pipeline wall (s) |",
        "|---|---|---|",
    ]
    for cpus in levels:
        r = results[cpus]
        lines.append(
            f"| local[{cpus}] | {r['value']} | {r['queries']['kg_pipeline']} |"
        )
    lines += [
        "",
        f"- throughput ratio local[{hi}]/local[{lo}]: **{ratio}x**",
        f"- scaling efficiency ((thr_4N/thr_N)/4): **{efficiency}**",
        "",
        "```json",
        json.dumps({str(k): v for k, v in results.items()}, indent=2),
        "```",
    ]
    with open(os.path.join(os.path.dirname(__file__) or ".", "BENCH.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(json.dumps({"scaling_efficiency": efficiency, "throughput": {str(k): results[k]["value"] for k in results}}))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        run_scaling(sf_dir)
        return
    result = run_bench(
        sf_dir, cpus, pipeline_only=os.environ.get("BENCH_ONLY_PIPELINE") == "1"
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
