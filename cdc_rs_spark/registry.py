"""Central query registry — the bridge to the driver contract.

Every implemented operator from SURVEY §2 registers here as a named query
(a (SparkSession, sf_dir) -> DataFrame callable) plus, when SQL-expressible,
the equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
`__spark_entry__.py` exposes this registry to the driver.

Column-name/type parity rule: every computed column is aliased identically in
the Spark code and the oracle SQL, and value encodings are chosen so both
engines stringify identically (exact double arithmetic, decimal(18,2) for
money, explicit date formatting).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}

_PLAN_MODULES = [
    "cdc_rs_spark.plans.cdc",
    "cdc_rs_spark.plans.relational",
    "cdc_rs_spark.plans.relational2",
    "cdc_rs_spark.plans.events",
    "cdc_rs_spark.plans.dedup",
    "cdc_rs_spark.plans.similarity",
    "cdc_rs_spark.plans.text",
    "cdc_rs_spark.plans.multimodal",
    "cdc_rs_spark.plans.pipeline",
]


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


# The driver's correctness gate checks the FIRST 50 registry entries only, in
# iteration order. This list pins those 50 slots so every operator family has
# a driver-verified flagship. ROUND-5 ROTATION (VERDICT r4 task 5): the
# thrice-green CDC-core / set_ops / scd2 / events-session / dedup-core slots
# rotate out for ~30 never-pinned queries (TPC-H q2/q8/q13/q17/q20/q21,
# events_asof_* picks, dq_*, sample_*, text_top_tokens_per_lang,
# hll_sketch_rollup_custkeys, the SimHash / n-gram / decontamination dedup
# variants, the cdc_* audit family), and every query whose IMPLEMENTATION
# changed this round is pinned: the two-stage top-k rewrites
# (similarity_bruteforce/quantized/ivf_topk, similarity_recall_eval,
# similarity_lsh_ann), the grouped-rank rewrites (sample_stratified_cap,
# text_quality_filter_median — both first-time pins), and the rhai compiler
# (tokenizer grew `..`/`while`) flagships. Rotated-out queries keep their
# module order after slot 50 and stay verified by tools/oracle_check.py +
# tools/driver_sim.py locally (CORRECTNESS_LOCAL_FULL.json). Late-r5 swap:
# six slots from doubly-covered families gave way to the six queries built
# AFTER the rotation (margin stats, per-lang quartiles, late-arrival audit,
# watermark recommendation, line-level dedup, quantization fidelity) so the
# driver verifies the round's new surface first-hand.
_DRIVER_WINDOW = [
    # ROUND-8 ROTATION (VERDICT r7 next #6): cumulative driver coverage
    # reached 185/185 in r7, so the window's job is now pinning each
    # round's NEW and CHANGED queries first, then rotating older slots
    # for repeat greens with family spread. Rotated-out queries keep
    # their module order after slot 50 and stay verified locally
    # (CORRECTNESS_LOCAL_FULL.json via tools/driver_sim.py).
    #
    # NEW this round — the four round-8 operators pin first (incremental
    # cluster maintenance, degree-oriented full-graph triangles, SemDeDup
    # on trained IVF centroids, hashed span-store keys)
    "dedup_incremental_clusters",
    "part_triangle_count_full",
    "part_kcore_2",  # round-8 new (iterative k-core peeling) — pins at birth
    "dedup_semantic_ivf_centroids",
    "dedup_span_store_hashed_probe",
    "dedup_span_cut_rewrite",  # round-8 new (span-level cutting rewrite)
    # changed this round (re-pin): streaming/ivf.py gained the snapshot
    # compare-and-retry + seq watermark; streaming/spans.py was
    # restructured around the epoch'd store; the SemDeDup report half
    # was factored into _semdedup_report
    "similarity_ivf_incremental_topk",
    "dedup_span_store_probe",
    "dedup_semantic_clustered",
    # rotation picks (none were in the r7 window; each family keeps at
    # least one slot). dedup_connected_components rides along with the
    # incremental form deliberately — the two share one oracle, so the
    # driver checks both sides of the incremental == batch claim.
    "dedup_connected_components",
    "dedup_minhash_lsh",
    "dedup_lsh_recall_eval",
    "dedup_line_level_report",
    "cdc_typed_projection",
    "cdc_incremental_agg_maintenance",  # the r7 bench-drift query
    "cdc_audit_trail",
    "cdc_time_travel_asof",
    "cdc_retraction_algebra",
    "rhai_script_debezium_envelope",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q12_shipping_priority_class",
    "q15_top_supplier",
    "q21_late_suppliers",
    "grouping_sets_lineitem",
    "window_running_totals",
    "customer_rfm_segments",  # round-8 new (NTILE-exact RFM segmentation)
    "supplier_revenue_gini",  # round-8 new (exact Gini via global rank)
    "approx_distinct_custkeys",
    "anti_join_customers_without_orders",
    "hll_sketch_rollup_custkeys",
    "heavy_hitters_cms_lineitem",
    "heavy_hitters_cms_incremental",  # round-8 new (streaming sketch store)
    "pagerank_part_graph",
    "events_funnel_conversion",
    "events_session_window",
    "similarity_ivf_topk",
    "similarity_pq_adc_topk",  # round-8 new (PQ/ADC) — pins at birth
    "similarity_ivfpq_topk",  # round-8 new (IVF-routed PQ) — pins at birth
    "similarity_ivfpq_incremental_topk",  # round-8 new (streaming IVF-PQ)
    "similarity_ivfpq_recall_eval",  # round-8 new (oracle-pinned recall)
    "similarity_hybrid_rrf_topk",  # round-8 new (reciprocal-rank fusion)
    "text_tfidf_keywords",
    "text_nb_source_classifier",  # round-8 new (learned NB filter) — pins at birth
    "text_nb_incremental_classifier",  # round-8 new (streaming NB training)
    "multimodal_video_frames",
    "scd2_order_price_history",
    "dq_expectations_orders",
    "pack_documents_token_budget",
    "gdpr_forget_manifest",
]


def load_all() -> dict[str, Query]:
    for mod in _PLAN_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # plan module not built yet
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"_DRIVER_WINDOW names unregistered queries: {missing}")
    ordered = {n: REGISTRY[n] for n in _DRIVER_WINDOW}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
