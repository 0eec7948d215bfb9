"""Shuffle-volume scaling probe for the banded-join dedup/ANN families
(VERDICT r3 task 7).

Runs each candidate-generating query over a fixture dir and records wall
time, output rows, and the DELTA of completed-stage shuffle read/write
bytes (Spark UI REST API — the probe enables the UI via SPARK_GRAFT_UI).
Run it at two scales produced by tools/gen_scale_fixtures.py (same
generator, 10x rows) and compare: a banded join that is genuinely linear
shows ~10x shuffle bytes; an accidental all-pairs shows ~100x.

Usage: python tools/scale_probe.py <fixture_dir> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

os.environ.setdefault("SPARK_GRAFT_UI", "true")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BANDED_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_connected_components",
    "decontaminate_eval_overlap",
    "dedup_canonical_quality",
    "dedup_ngram_jaccard",
    "similarity_lsh_ann",
    "similarity_ivf_topk",
]


def stage_totals(spark) -> tuple[int, int]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        data = json.load(r)
    return (
        sum(s.get("shuffleReadBytes", 0) for s in data),
        sum(s.get("shuffleWriteBytes", 0) for s in data),
    )


def main() -> int:
    from cdc_rs_spark.registry import load_all
    from cdc_rs_spark.session import get_spark

    sf_dir = sys.argv[1]
    names = sys.argv[2:] or BANDED_QUERIES
    reg = load_all()
    results = {}
    for name in names:
        # fresh session per query: session-level memo caches (signed docs,
        # IVF model) and cross-query lazy materialization otherwise bleed
        # one query's shuffles into another's delta
        spark = get_spark(f"scale-probe-{name}")
        t0 = time.time()
        rd0, wr0 = stage_totals(spark)
        n = reg[name].fn(spark, sf_dir).count()
        dt = time.time() - t0
        rd1, wr1 = stage_totals(spark)
        results[name] = {
            "rows": n,
            "sec": round(dt, 2),
            "shuffle_read_mb": round((rd1 - rd0) / 2**20, 3),
            "shuffle_write_mb": round((wr1 - wr0) / 2**20, 3),
        }
        print(name, results[name], flush=True)
        spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
