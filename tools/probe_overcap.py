"""Over-cap fallback scale probe (round 12, VERDICT r11 next #2): drive
the hot-bucket guard's SECOND layer — the PPJoin reroute for over-cap
DISTINCT-text buckets — at two scales and record shuffle growth.

Corpus: gen_scale_fixtures' near-template families (400 distinct
single-word mutants of a 100-word template per family; pairwise jaccard
~0.9, so ~312 distinct texts share each band bucket — past the 256 cap,
and byte-identical collapse cannot defuse them). Family COUNT scales
with the corpus while family SIZE stays fixed, so both the routed
PPJoin work and the true-pair output should grow ~linearly; a quadratic
reroute would show as a super-linear shuffle ratio.

Per scale the probe records: max distinct-text bucket population, the
routed doc count (must be > 0 — the arm actually fired), verified pair
count, wall, and the shuffle read/write delta (Spark UI REST).

Usage: python tools/probe_overcap.py [out_json]
Writes SCALE_PROBE_OVERCAP_r12.json by default.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("SPARK_GRAFT_UI", "true")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import stage_totals  # noqa: E402

SCALES = [
    {"n_docs": 2_000, "families": 2},
    {"n_docs": 20_000, "families": 20},
]


def run_scale(n_docs: int, families: int, workdir: str) -> dict:
    import subprocess

    from pyspark.sql import functions as F

    from cdc_rs_spark.operators.dedup import (
        DEDUP_BUCKET_CAP,
        exact_text_groups,
        guarded_band_candidates,
        minhash_dedup_pairs,
        minhash_docs,
    )
    from cdc_rs_spark.session import get_spark

    fix = os.path.join(workdir, f"fix_{n_docs}")
    subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "gen_scale_fixtures.py"),
            str(n_docs), "64", fix, "0", "0.0", str(families),
        ],
        check=True,
        capture_output=True,
    )
    spark = get_spark(f"probe-overcap-{n_docs}")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = spark.read.parquet(os.path.join(fix, "documents.parquet"))
        df = docs.select("doc_id", "text")
        # guard introspection: bucket population + routed set size
        _, reps = exact_text_groups(df, "doc_id", "text")
        signed = minhash_docs(reps, "doc_id", "text")
        cand, oversized = guarded_band_candidates(signed, DEDUP_BUCKET_CAP)
        from cdc_rs_spark.operators.dedup import band_explode

        mx = (
            band_explode(signed.select("doc_id", "sig"))
            .groupBy("band", "bkey")
            .count()
            .agg(F.coalesce(F.max("count"), F.lit(0)).alias("m"))
            .collect()[0]["m"]
        )
        n_routed = oversized.count()
        rd0, wr0 = stage_totals(spark)
        t0 = time.time()
        n_pairs = minhash_dedup_pairs(
            df, "doc_id", "text", 0.5, memo=False
        ).count()
        dt = time.time() - t0
        rd1, wr1 = stage_totals(spark)
        return {
            "n_docs_total": docs.count(),
            "families": families,
            "max_distinct_bucket": int(mx),
            "n_routed_docs": int(n_routed),
            "n_pairs": int(n_pairs),
            "sec": round(dt, 2),
            "shuffle_read_mb": round((rd1 - rd0) / 2**20, 3),
            "shuffle_write_mb": round((wr1 - wr0) / 2**20, 3),
        }
    finally:
        spark.stop()


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_PROBE_OVERCAP_r12.json"
    workdir = tempfile.mkdtemp(prefix="probe_overcap_")
    try:
        rows = [run_scale(s["n_docs"], s["families"], workdir) for s in SCALES]
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    small, large = rows
    out = {
        "scales": rows,
        "ratios": {
            "docs": round(large["n_docs_total"] / small["n_docs_total"], 2),
            "pairs": round(large["n_pairs"] / max(small["n_pairs"], 1), 2),
            "shuffle_read": round(
                large["shuffle_read_mb"] / max(small["shuffle_read_mb"], 1e-9), 2
            ),
            "shuffle_write": round(
                large["shuffle_write_mb"] / max(small["shuffle_write_mb"], 1e-9), 2
            ),
        },
        "note": (
            "family count scales 10x at fixed family size; linear reroute "
            "=> pair/shuffle ratios ~ corpus ratio, quadratic => ~100x"
        ),
    }
    print(json.dumps(out, indent=2))
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
