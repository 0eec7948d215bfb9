"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
SUMMARY-ONLY JSON line on stdout: {"metric", "value", "unit", "sf",
"n_queries", "worst5", "note"} — under 1 KB so the driver's tail-capture
window always holds it whole (rounds 7-8; lines that embedded the
per-query dict were clipped mid-dict, leaving BENCH_r*.json with
parsed:null). The per-query table and full detail (3 dp warm, cold
samples, noise spreads) go to $SPARK_GRAFT_BENCH_DETAIL (default
./BENCH_DETAIL.json) and stderr.

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

    # round-6 (VERDICT r5 task 3): one representative WARM-UP QUERY before
    # the alphabetical sweep, excluded from the table. The r5 driver tail
    # indicted innocent early-alphabet queries with 4-7 s cold-start
    # artifacts (q6: 4.54 s in-suite vs 0.41 s isolated-warm) because
    # fresh-JVM JIT, whole-stage-codegen compilation, shuffle machinery and
    # big-table parquet footers all first fire inside whichever query sorts
    # first. Exercise those paths once here: scan+filter+join+hash-agg+
    # distinct over the two largest tables, then a window.
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

    # best-of-N per query, N >= 3 (BENCH_NOTES.md: in-suite vs isolated
    # timings diverged up to 2x at N=2 — JIT/GC/page-cache state depends on
    # suite position; the min of >=3 back-to-back runs is the stable
    # estimate of a query's actual cost, and the FIXED alphabetical order
    # makes suite-position effects reproducible run-over-run)
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    colds: dict[str, float] = {}

    def clear_memos() -> None:
        """Purge the session memos (exact-ANN baseline, IVF model, MinHash
        signatures) before EACH query's sample loop: they legitimately
        dedupe work within one query chain, but across the bench they'd
        turn every family member after the alphabetically-first into a
        memo hit in BOTH the cold and min columns (round-5 review) — a
        recompute-path regression would stay invisible. With the purge,
        queries_cold is genuinely cold per query and min-of-N shows the
        intra-query warm path."""
        try:
            from cdc_rs_spark.operators import dedup as od
            from cdc_rs_spark.plans import similarity as ps

            from cdc_rs_spark.plans import relational2 as pr2

            for cache in (
                ps._EXACT_TOPK_CACHE,
                ps._IVF_MODEL_CACHE,
                pr2._CORENESS_CACHE,
            ):
                for k in list(cache):
                    v = cache.pop(k)
                    try:
                        v.unpersist(blocking=False)
                    except Exception:  # noqa: BLE001 — model tuples etc.
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
        except Exception:  # noqa: BLE001 — memo layout drift never kills bench
            pass
    from cdc_rs_spark import benchphase

    build_serve: dict[str, dict] = {}
    for name, q in sorted(registry.items()):
        # stderr breadcrumb: correlates engine-log events (codegen
        # fallbacks, spills) with the query that caused them
        print(f"[bench] {name}", file=sys.stderr, flush=True)
        clear_memos()
        samples = []
        phase_recs: list[dict] = []
        for _ in range(n_runs):
            # timer covers plan construction too: iterative operators (e.g.
            # connected components) run actions while building their result
            benchphase.active = rec = {}
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            benchphase.active = None
            phase_recs.append(rec)
        timings[name] = round(min(samples), 3)
        # build/serve split (round 9, VERDICT r8 next #4): the incremental
        # families construct their persisted store/index per invocation by
        # design; they mark that section with benchphase.build_phase(), and
        # the best sample's wall time splits into the store-construction
        # cost vs the serving path — so the worst-5 stops needing a
        # re-explained disclaimer every round
        best = min(range(len(samples)), key=samples.__getitem__)
        b = phase_recs[best].get("build_sec")
        if b is not None:
            build_serve[name] = {
                "build_sec": round(b, 3),
                "serve_sec": round(max(samples[best] - b, 0.0), 3),
            }
        # cold = FIRST sample: for session-memoized families (exact-ANN
        # baseline, IVF model) min-of-N reports the memo hit and can mask a
        # plan regression in the recompute path (VERDICT r4 finding 3) —
        # the first sample is the only one that pays the real plan cost
        colds[name] = round(samples[0], 3)
        # max/min spread: >2 flags a query whose first sample pays one-time
        # costs (codegen compile, broadcast build) — read best, not mean
        spreads[name] = round(max(samples) / max(min(samples), 1e-9), 2)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    worst5 = sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    # ---- tail-sized aggregates (round 13, VERDICT r12 next #1a): the
    # driver keeps only a ~2000-char stdout tail, so PERF_r11/r12 had no
    # per-query ground truth and a host-contaminated total (+60%) could
    # not be localized. These stay under ~1.3 KB combined:
    #   families        per-module wall subtotals (9 entries) — localizes
    #                   a regression to an operator family
    #   median_sec      suite median per-query wall — a host-drift gauge
    #                   (code changes move specific queries; host drift
    #                   moves the median)
    #   sentinel_median median over a FIXED set of stable queries that
    #                   optimization rounds do not touch — the cleanest
    #                   drift denominator
    #   queries         a SMALL fixed subset (the 7 lifecycle queries the
    #                   optimization rounds target + the 8 sentinels), so
    #                   the driver's per-query and scaling blocks populate
    #                   again without the 260-entry table that clipped
    #                   rounds 7-8
    fam_totals: dict[str, float] = {}
    for name, q in registry.items():
        fam = q.fn.__module__.rsplit(".", 1)[-1]
        fam_totals[fam] = fam_totals.get(fam, 0.0) + timings[name]
    families = {k: round(v, 1) for k, v in sorted(fam_totals.items())}
    svals = sorted(timings.values())
    median_sec = round(svals[len(svals) // 2], 3)
    sentinel_names = [
        "q1_pricing_summary", "cdc_typed_projection",
        "events_session_window", "text_langid", "dedup_minhash_lsh",
        "part_triangle_count", "multimodal_image_near_dup",
        "similarity_hybrid_rrf_topk",
    ]
    lifecycle_names = [
        "gdpr_forget_end_to_end", "gdpr_forget_end_to_end_v2",
        "curation_funnel_incremental", "curation_funnel_retraction",
        "dedup_incremental_clusters", "dedup_clusters_retraction",
        "dedup_clusters_readmit",
    ]
    sent = sorted(timings[n] for n in sentinel_names if n in timings)
    sentinel_median = round(sent[len(sent) // 2], 3) if sent else None
    stdout_queries = {
        n: timings[n]
        for n in lifecycle_names + sentinel_names
        if n in timings
    }
    # STDOUT carries ONE compact SUMMARY-ONLY JSON line (<1 KB). Round 8,
    # VERDICT r7 next #4: the driver keeps only a TAIL window of stdout,
    # and even the round-7 "compact" line still embedded the full
    # per-query dict (~6 KB) — the window clipped it mid-dict and
    # BENCH_r*.json stayed parsed:null. The per-query table now lives
    # ONLY in the DETAIL artifact ($SPARK_GRAFT_BENCH_DETAIL) + stderr;
    # stdout's one short line always fits the tail whole.
    compact = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "sf": float(sf) if sf else sf_dir,
        "n_queries": len(timings),
        "runs_per_query": n_runs,
        "worst5": [[k, v] for k, v in worst5],
        "median_sec": median_sec,
        "sentinel_median": sentinel_median,
        "families": families,
        "queries": stdout_queries,
        # memo-order disclosure (VERDICT r6 "what's wrong" #2): the FIRST
        # similarity_* query of a session builds the memoized exact-ANN
        # baseline (~7 s at sf0.1); the rest of the family rides it. The
        # suite purges memos per query, so these numbers are memo-free.
        "note": "full 260-query table in BENCH_DETAIL.json; stdout "
        "queries = 7 lifecycle + 8 fixed sentinels so the tail parses "
        "whole; see BENCH_NOTES.md",
    }
    detail = {
        **compact,
        "queries": timings,
        "queries_cold": colds,
        "order": "alphabetical (fixed; suite position = sorted rank)",
        "noise_spread_maxmin": spreads,
        # per-invocation store/index builders, split at the init/fold vs
        # probe boundary (benchphase.build_phase markers; best sample)
        "build_serve": build_serve,
    }
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_DETAIL.json"),
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f)
    print(json.dumps(detail), file=sys.stderr)
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
