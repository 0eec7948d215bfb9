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
# a driver-verified flagship. ROUND-3 ROTATION (VERDICT r2 task 3): 15 slots
# that were driver-green in BOTH r1 and r2 rotate out in favor of round-2
# additions and the round-3 plan rewrites (two-pass ranks, sampled-Lloyd IVF,
# TakeOrdered top-k), so the driver's independent hash check reaches queries
# it has never pinned. Rotated-out queries keep their module order after slot
# 50 and stay verified by tools/oracle_check.py + tools/driver_sim.py locally.
_DRIVER_WINDOW = [
    # CDC core — the reference's own operator surface
    "cdc_backfill_bigquery",
    "cdc_merge_live_wins",
    "cdc_compact_latest",
    "cdc_envelope_opcodes",
    "cdc_change_rate_stats",
    "cdc_incremental_agg_maintenance",
    "cdc_join_view_maintenance",
    "cdc_snapshot_diff",
    "cdc_audit_trail",
    "envelope_field_histogram",
    # relational breadth
    "q1_pricing_summary",
    "q3_shipping_priority",
    "cdc_time_travel_asof",
    "cdc_retraction_algebra",
    "anti_join_customers_without_orders",
    "q12_shipping_priority_class",
    "grouping_sets_lineitem",
    "approx_distinct_custkeys",
    "array_functions_nation_suppliers",
    "window_top_orders_per_segment",
    "pagerank_part_graph",
    "winsorized_price_stats",
    "outlier_iqr_approx_lineitem",
    # event-time / streaming batch-forms
    "cdc_schema_evolution",
    "events_session_window",
    "events_asof_last_click",
    "events_range_join_bucketed",
    "events_quota_enforcement",
    "events_funnel_conversion",
    # dedup family
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_connected_components",
    "decontaminate_eval_overlap",
    "dedup_canonical_quality",
    # similarity / ANN family
    "similarity_bruteforce_topk",
    "similarity_lsh_ann",
    "similarity_ivf_topk",
    "similarity_quantized_topk",
    # text analysis
    "dedup_lsh_recall_eval",
    "text_cleaning_funnel",
    "text_quality_deciles",
    # multimodal plumbing
    "similarity_recall_eval",
    "multimodal_payload_dedup",
    # training-data pipeline
    "pack_documents_token_budget",
    "heavy_hitters_cms_lineitem",
    "corpus_shuffle_deterministic",
    "curriculum_batches",
    "feature_ntile_binning_lineitem",
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
