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
# a driver-verified flagship. ROUND-4 ROTATION (VERDICT r3 task 3): 15 slots
# that were driver-green in BOTH r2 and r3 rotate out in favor of
# never-pinned queries — the rhai_script_* trio, the set_ops_* and scd2_*
# families, gdpr_forget_manifest — and this round's plan rewrites
# (supplier_revenue_pareto on the two-pass rank/cumsum; similarity_ivf_topk
# and similarity_recall_eval stay pinned because their training rule changed
# this round). Rotated-out queries keep their module order after slot 50 and
# stay verified by tools/oracle_check.py + tools/driver_sim.py locally.
_DRIVER_WINDOW = [
    # CDC core — the reference's own operator surface
    "cdc_backfill_bigquery",
    "cdc_merge_live_wins",
    "cdc_compact_latest",
    "cdc_envelope_opcodes",
    "cdc_incremental_agg_maintenance",
    "cdc_join_view_maintenance",
    # user-script compiler (never pinned before)
    "rhai_script_bigquery_envelope",
    "rhai_script_debezium_envelope",
    "rhai_script_topic_routing",
    # relational breadth
    "q1_pricing_summary",
    "cdc_time_travel_asof",
    "cdc_retraction_algebra",
    "grouping_sets_lineitem",
    "window_top_orders_per_segment",
    "pagerank_part_graph",
    "winsorized_price_stats",
    "outlier_iqr_approx_lineitem",
    "supplier_revenue_pareto",
    "set_ops_active_custkeys",
    "set_ops_multiset_custkeys",
    "set_ops_intersect_all",
    # SCD2 family (never pinned before)
    "scd2_order_price_history",
    "scd2_as_of_snapshot",
    "scd2_temporal_fact_join",
    # event-time / streaming batch-forms
    "cdc_schema_evolution",
    "events_session_window",
    "events_range_join_bucketed",
    "events_quota_enforcement",
    "events_concurrent_sessions",
    "ewma_daily_revenue",
    # dedup family
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "dedup_connected_components",
    "dedup_canonical_quality",
    # similarity / ANN family
    "similarity_bruteforce_topk",
    "similarity_lsh_ann",
    "similarity_ivf_topk",
    # text analysis
    "dedup_lsh_recall_eval",
    "text_quality_deciles",
    "text_tfidf_keywords",
    # multimodal plumbing
    "similarity_recall_eval",
    "multimodal_payload_dedup",
    # training-data pipeline / governance
    "pack_documents_token_budget",
    "heavy_hitters_cms_lineitem",
    "corpus_shuffle_deterministic",
    "curriculum_batches",
    "zorder_layout_audit_lineitem",  # new r4 — pin over twice-green ntile
    "k_anonymity_audit_customer",
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
