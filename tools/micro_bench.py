"""Micro-bench a subset of registered queries with bench.py's exact
methodology (noop sink, best-of-N, per-query memo purge) — the fast
inner loop for optimization work; the full suite stays bench.py's job.

Usage: python tools/micro_bench.py [sf_dir] query [query ...]
       SPARK_GRAFT_BENCH_RUNS=N to change N (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    os.environ.setdefault("SPARK_GRAFT_UI", "true")  # REST metrics source
    from cdc_rs_spark.registry import load_all
    from cdc_rs_spark.session import get_spark

    registry = load_all()
    spark = get_spark("micro-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py (JVM, Arrow pool, codegen, big footers)
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    import pandas as pd  # noqa: F401

    warm = spark.range(0, 64, 1, 32)
    warm.mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    ords = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    (
        li.filter(F.col("l_quantity") > 0)
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum("l_extendedprice").alias("s"),
            F.countDistinct("o_custkey").alias("c"),
        )
    ).write.format("noop").mode("overwrite").save()
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    ords.select(F.row_number().over(w).alias("rn")).write.format(
        "noop"
    ).mode("overwrite").save()

    # bench.py's memo purge, imported as-is by running its clear logic
    def clear_memos() -> None:
        try:
            from cdc_rs_spark.operators import dedup as od
            from cdc_rs_spark.plans import relational2 as pr2
            from cdc_rs_spark.plans import similarity as ps

            for cache in (
                ps._EXACT_TOPK_CACHE,
                ps._IVF_MODEL_CACHE,
                pr2._CORENESS_CACHE,
            ):
                for k in list(cache):
                    v = cache.pop(k)
                    try:
                        v.unpersist(blocking=False)
                    except Exception:  # noqa: BLE001
                        pass
            for entry in od._COLLAPSED_CACHE:
                for frame in entry[3:]:
                    try:
                        frame.unpersist(blocking=False)
                    except Exception:  # noqa: BLE001
                        pass
            od._COLLAPSED_CACHE.clear()
            import shutil

            from cdc_rs_spark.plans import dedup as pdd

            for path in pdd._INC_BOOT_CACHE.values():
                shutil.rmtree(path, ignore_errors=True)
            pdd._INC_BOOT_CACHE.clear()
        except Exception:  # noqa: BLE001
            pass

    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def job_stats() -> tuple[int, float]:
        """(n_jobs_so_far, total_task_time_sec_so_far) via the REST API
        (tools/scale_probe.py's method) — job count is deterministic per
        code path, and the summed executor run time is far less noisy
        than wall clock (it counts work done, not scheduling gaps), so an
        A/B diff of the two resolves changes that host variance drowns.
        Requires SPARK_GRAFT_UI=true (set below before session build)."""
        if not ui:
            return 0, 0.0
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded&status=failed&status=running") as r:
            jobs = json.load(r)
        n = max((j["jobId"] + 1 for j in jobs), default=0)
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
            stages = json.load(r)
        total_ms = sum(s.get("executorRunTime", 0) for s in stages)
        return n, total_ms / 1000.0

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    out = {}
    for name in args:
        q = registry[name]
        clear_memos()
        samples = []
        jobs0, task0 = job_stats()
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        jobs1, task1 = job_stats()
        out[name] = {
            "min": round(min(samples), 3),
            "cold": round(samples[0], 3),
            "all": [round(s, 3) for s in samples],
            "jobs_per_run": round((jobs1 - jobs0) / n_runs, 1),
            "task_sec_per_run": round((task1 - task0) / n_runs, 2),
        }
        print(f"[micro] {name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
