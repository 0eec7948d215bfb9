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
    # ROUND-6 ROTATION: the 27 slots that were driver-green twice or more
    # rotate out for 26 NEVER-pinned queries (events windowing/retention
    # family, the multimodal escape hatches, the text-analysis long tail,
    # pivot/unpivot/profile relational extras, embedding audits, pipeline
    # mix/hashing) — plus the two queries BUILT this round and the rhai
    # flagships whose compiler gained closures/runtime loops. The 23 slots
    # with only one green stay for their second. Rotated-out queries keep
    # their module order after slot 50 and stay verified locally
    # (CORRECTNESS_LOCAL_FULL.json via tools/driver_sim.py).
    #
    # user-script compiler (closures + runtime-bound loops compile now —
    # pin the new flagship and the two widest existing scripts)
    "rhai_script_closure_while_scoring",  # r6 new — driver-pin
    "rhai_script_array_loop_scoring",
    "rhai_script_bigquery_envelope",  # engine changed — re-pin
    # CDC core second-green
    "cdc_typed_projection",
    # incremental ANN index (r6 new subsystem) + embedding audits
    "similarity_ivf_incremental_topk",  # r6 new — driver-pin
    "similarity_margin_stats",
    "embedding_quantization_error_audit",
    "embedding_label_centroids",  # first pin
    "embedding_norm_stats",  # first pin
    # relational breadth — first-time picks
    "sql_api_nation_counts",  # first pin
    "pivot_status_by_priority",  # first pin
    "unpivot_priority_metrics",  # first pin
    "profile_orders_columns",  # first pin
    "nation_revenue_share_of_region",  # first pin
    "orders_rolling_7day_revenue",  # first pin
    "window_percent_rank_segments",
    "hll_sketch_rollup_custkeys",
    "benford_digit_audit_orders",
    "customer_cohort_ltv",
    # event-time — first-time windowing/retention picks + second-greens
    "events_sliding_window",  # first pin
    "events_markov_transitions",  # first pin
    "events_weekly_retention",  # first pin
    "events_daily_gapfill",  # first pin
    "events_debounce",  # first pin
    "events_user_growth_accounting",  # first pin
    "events_asof_next_purchase",
    "events_late_arrival_audit",
    "events_watermark_recommendation",
    "events_attribution_last_touch",
    "events_conversion_latency_quantiles",
    "anomaly_zscore_daily_revenue",
    # dedup second-greens
    "dedup_cluster_report",
    "dedup_line_level_report",
    # multimodal escape hatches — never driver-checked before
    "multimodal_video_frames",  # first pin
    "multimodal_image_decode",  # first pin
    # text — first-time long-tail picks + second-greens
    "text_fingerprint",  # first pin
    "text_bpe_token_estimate",  # first pin
    "text_repetition_stats",  # first pin
    "text_boilerplate_ngrams",  # first pin
    "text_char_gini_score",  # first pin
    "text_langid_confusion",  # first pin
    "text_quality_quartiles_by_lang",
    "text_quality_filter_median",
    "text_top_tokens_per_lang",
    # pipeline / governance — first-time picks + second-greens
    "data_mix_by_source",  # first pin
    "feature_hashing_buckets",  # first pin
    "sample_stratified_cap",
    "sample_weighted_priority",
    "dq_expectations_orders",
    "dq_referential_integrity",
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
