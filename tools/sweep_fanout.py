"""Measure every bench query with the _t scan fan-out forced ON vs OFF.

Decides, per query, whether the adaptive fan-out exchange pays for itself
(map-heavy operators) or is pure overhead (shuffle-first operators that
scan a table several times). Prints a per-query table and the list of
queries where OFF wins by more than the noise floor.

Usage: SPARK_GRAFT_CPUS=32 python tools/sweep_fanout.py [sf_dir] 2>/dev/null
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.capture_plans import BENCH_QUERIES  # noqa: E402


def main() -> None:
    from sssom_curator_spark.session import get_spark

    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="sweep-fanout",
        master=f"local[{cpus}]",
        extra={"spark.sql.shuffle.partitions": str(max(16, 2 * cpus))},
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = entrymod.queries()
    only = set(os.environ.get("SWEEP_ONLY", "").split(",")) - {""}
    names = [n for n in BENCH_QUERIES if not only or n in only]
    results = {}
    for name in names:
        row = {}
        for mode in (True, False):
            entrymod._FAN_OUT_OVERRIDE = mode
            walls = []
            for _ in range(3):
                t0 = time.monotonic()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                walls.append(time.monotonic() - t0)
            row[mode] = min(walls[1:])  # min of post-warmup trials
        entrymod._FAN_OUT_OVERRIDE = None
        results[name] = row
        print(f"{name:28s} on={row[True]:6.2f} off={row[False]:6.2f} "
              f"{'OFF wins' if row[False] < row[True] * 0.9 else ''}", flush=True)
    losers = [n for n, r in results.items() if r[False] < r[True] * 0.9]
    print("\nfan_out=False candidates:", losers)
    spark.stop()


if __name__ == "__main__":
    main()
