"""Profile the streaming cluster fold's per-batch fixed cost: folds N
tiny batches and prints per-batch wall plus the Spark job timeline for
one mid-stream batch (job description + duration), to locate the fixed
stages the r11 verdict flagged (~12 AQE stages at 500-row batches).

Usage: python tools/profile_fold.py [n_batches] [rows_per_batch]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    from pyspark.sql import functions as F

    from cdc_rs_spark.session import get_spark
    from cdc_rs_spark.streaming.clusters import (
        clusters_foreach_batch,
        init_cluster_store,
    )

    spark = get_spark("profile-fold")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    root = tempfile.mkdtemp(prefix="profile_fold_")
    sig, sh = os.path.join(root, "sig"), os.path.join(root, "sh")
    croot = os.path.join(root, "clusters")
    spark.createDataFrame(
        [], "doc_id bigint, band int, bkey string"
    ).write.parquet(sig)
    spark.createDataFrame(
        [], "doc_id bigint, sh array<string>"
    ).write.parquet(sh)
    init_cluster_store(spark, croot)
    fn = clusters_foreach_batch(sig, sh, croot, threshold=0.5)

    docs = spark.range(n_batches * per).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(1, 30), "
            "j -> concat('w', pmod(xxhash64(id * 37 + j), 50000))))"
        ).alias("text"),
    ).localCheckpoint(eager=True)
    batches = [
        docs.filter(
            (F.col("doc_id") >= b * per) & (F.col("doc_id") < (b + 1) * per)
        ).localCheckpoint(eager=True)
        for b in range(n_batches)
    ]

    walls = []
    marks = {}
    for b, bdf in enumerate(batches):
        if b == n_batches - 2:
            marks["j0"] = _n_jobs(ui, app_id)
        t0 = time.time()
        fn(bdf, b)
        walls.append(round(time.time() - t0, 2))
        if b == n_batches - 2:
            marks["j1"] = _n_jobs(ui, app_id)

    print("per-batch wall:", walls)
    tail = sorted(walls[len(walls) // 3 :])
    print("median wall (steady):", tail[len(tail) // 2])
    jobs = _jobs(ui, app_id)
    picked = [
        j for j in jobs if marks["j0"] <= j["jobId"] < marks["j1"]
    ]
    picked.sort(key=lambda j: j["jobId"])
    total = 0.0
    by_phase = {}
    for j in picked:
        d = _dur(j)
        total += d
        desc = j.get("description") or j.get("name", "")
        key = desc if desc.startswith("cluster_fold:") else "(unlabeled)"
        agg = by_phase.setdefault(key, [0, 0.0])
        agg[0] += 1
        agg[1] += d
        print(
            f"  job {j['jobId']:>4} {d:7.0f} ms  stages={len(j.get('stageIds', []))} "
            f"tasks={j.get('numTasks')}  {desc[:90]}"
        )
    print(f"jobs={len(picked)} sum_job_ms={total:.0f}")
    for k in sorted(by_phase, key=lambda k: -by_phase[k][1]):
        n, ms = by_phase[k]
        print(f"  phase {k:<32} jobs={n:>3} {ms:8.0f} ms")
    return 0


def _jobs(ui, app_id):
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
        return json.load(r)


def _n_jobs(ui, app_id):
    js = _jobs(ui, app_id)
    return (max(j["jobId"] for j in js) + 1) if js else 0


def _dur(j):
    from datetime import datetime

    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
    try:
        t0 = datetime.strptime(j["submissionTime"], fmt)
        t1 = datetime.strptime(j["completionTime"], fmt)
        return (t1 - t0).total_seconds() * 1000.0
    except Exception:
        return 0.0


if __name__ == "__main__":
    sys.exit(main())
