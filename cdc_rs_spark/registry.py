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
    # ROUND-10 ROTATION (VERDICT r9 next #8, the standing discipline):
    # pin every round-10 NEW and CHANGED query first, then fill with
    # never-pinned rotation picks and family-spread repeats. Cumulative
    # driver coverage through r9 is 244/244; rotated-out queries keep
    # their module order after slot 50 and stay verified locally
    # (CORRECTNESS_LOCAL_FULL.json via tools/driver_sim.py).
    #
    # NEW this round — the retraction family (CDC deletes into every
    # streaming store), the GDPR end-to-end purge audit, OPQ rotation,
    # and the unigram-LM tokenizer pair — pinned at birth:
    "curation_funnel_retraction",
    "dedup_clusters_retraction",
    "text_nb_retraction_classifier",
    "similarity_ivf_tombstone_topk",
    "gdpr_forget_end_to_end",
    "similarity_opq_recall_eval",
    "text_unigram_lm_train",
    "text_unigram_encode_fertility",
    "heavy_hitters_cms_retraction",  # CDC deletes into the CMS grid
    "quantile_histogram_retraction",  # CDC deletes into the quantile store
    "similarity_silhouette_eval",  # sampled cluster-quality eval (r10)
    # CHANGED this round (re-pin): the r9 funnel + NB/cluster/IVF
    # incremental queries share code with the new retraction paths
    # (funnel_gates split, read_counts vocab zero-drop, fold_pairs
    # tombstone guard, probe tombstone anti-joins, the residual-ADC
    # refactor for OPQ); LPA/BFS gained degree-gated hub salting;
    # decile-lift/survival/IO-roundtrip carry the ADVICE r9 fixes;
    # the anchor store probe rides the span store's delete path
    "curation_funnel_incremental",
    "text_nb_incremental_classifier",
    "dedup_incremental_clusters",
    "similarity_ivf_incremental_topk",
    "similarity_ivfpq_incremental_topk",
    "similarity_ivfpq_residual_topk",
    "similarity_ivfpq_residual_incremental_topk",
    "part_community_lpa",
    "part_bfs_distance",
    "text_nb_decile_lift",
    "events_survival_km",
    "io_format_roundtrip_checksum",
    "dedup_anchor_store_probe",
    # NEVER-PINNED rotation picks (first driver look at these twelve)
    "q4_order_priority",
    "q6_revenue_forecast",
    "q7_volume_shipping",
    "q10_returned_items",
    "q11_important_parts",
    "q16_supplier_count",
    "q19_disjunctive_revenue",
    "rollup_order_stats",
    "cube_lineitem_flags",
    "distinct_agg_parts_per_flag",
    "date_functions_orders",
    "outlier_iqr_lineitem",
    # family-spread repeat greens (CDC core incl. the batch retraction
    # algebra and the forget manifest the new e2e composes, TPC-H
    # anchors, events, dedup, ANN baseline, text gates, multimodal,
    # sampling, sketches, splits)
    "cdc_backfill_bigquery",
    "cdc_retraction_algebra",
    "gdpr_forget_manifest",
    "q1_pricing_summary",
    "q21_late_suppliers",
    "events_session_window",
    "events_funnel_conversion",
    "dedup_minhash_lsh",
    "dedup_semantic_ivf_centroids",
    "similarity_bruteforce_topk",
    "text_quality_filter_median",
    "text_cleaning_funnel",
    "multimodal_image_decode",
    "sample_stratified_cap",
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
