"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced through full execution with the noop sink (count()
would let Catalyst prune the projections and under-report). Session startup
is excluded; per-query wall time is measured around the action only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from cdc_rs_spark.registry import load_all
    from cdc_rs_spark.session import get_spark

    registry = load_all()
    spark = get_spark("cdc-rs-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers so q1 doesn't pay one-time costs
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    # warm the Python/Arrow worker pool so the first pandas-path query isn't
    # charged ~3 s of per-core daemon spin-up
    import pandas as pd  # noqa: F401

    warm = spark.range(0, 64, 1, 32)
    warm.mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    # best-of-N per query: host CPU contention adds up to ±2x noise to a
    # single sample; the min of N back-to-back runs is the stable estimate
    # of the query's actual cost (runs share warm page cache by design)
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    timings: dict[str, float] = {}
    for name, q in sorted(registry.items()):
        best = float("inf")
        for _ in range(n_runs):
            # timer covers plan construction too: iterative operators (e.g.
            # connected components) run actions while building their result
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs_per_query": n_runs,
                "sf": float(sf) if sf else sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
