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
    # ROUND-12 ROTATION (the standing discipline): pin every round-12
    # NEW and CHANGED query first, then fill with family-spread repeat
    # greens — this round preferring queries NOT pinned in recent
    # windows (cumulative driver coverage through r11 is 258/258).
    # Rotated-out queries keep their module order after slot 50 and
    # stay verified locally (CORRECTNESS_LOCAL_FULL.json via
    # tools/driver_sim.py).
    #
    # NEW this round — the 8-store forget->readmit->re-ingest lifecycle
    # audit and the trained Givens OPQ chain — pinned at birth:
    "gdpr_forget_end_to_end_v2",
    "similarity_opq_givens_recall",
    # CHANGED this round (re-pin): every query riding the streaming
    # cluster fold — round 12 reordered its store appends (group rows
    # last), added fold-integrated auto-compaction, the no-candidate
    # fast path, the semi-join probe, driver-side bucket hashing, the
    # legacy-coverage collapse in remove_docs, and the '{stream}!ra'
    # readmit ledger line.
    "dedup_incremental_clusters",
    "dedup_clusters_retraction",
    "dedup_clusters_readmit",
    "curation_funnel_incremental",
    "curation_funnel_retraction",
    "gdpr_forget_end_to_end",
    # family-spread repeat greens, rotated toward the long-unpinned:
    # CDC core + rhai
    "cdc_typed_projection",
    "cdc_envelope_opcodes",
    "cdc_regex_filter",
    "cdc_time_travel_asof",
    "cdc_schema_evolution",
    "rhai_script_closure_while_scoring",
    # TPC-H / relational anchors
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q14_promo_revenue",
    "q18_large_volume_customer",
    "q22_idle_customers",
    "grouping_sets_lineitem",
    # sketches + graph
    "heavy_hitters_cms_incremental",
    "hll_sketch_rollup_custkeys",
    "quantile_histogram_incremental",
    "part_triangle_count",
    "part_kcore_2",
    "pagerank_part_graph",
    # events
    "events_asof_last_click",
    "events_range_join_bucketed",
    "events_weekly_retention",
    "events_salted_user_join",
    "events_pattern_regex_cep",
    "events_watermark_recommendation",
    # dedup variants
    "dedup_exact",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_semantic_clustered",
    "dedup_anchor_shift_invariance",
    # similarity / ANN
    "similarity_ivfpq_residual_topk",
    "similarity_ivfpq_residual_recall_eval",
    "similarity_hybrid_rrf_topk",
    "similarity_silhouette_eval",
    "embedding_matryoshka_truncation_audit",
    # text
    "text_langid",
    "text_bpe_train_merges",
    "text_nb_auc_eval",
    "text_zipf_rank_ratio_audit",
    # multimodal + pipeline
    "multimodal_image_near_dup",
    "multimodal_audio_vad_segments",
    "pack_documents_token_budget",
    "scd2_order_price_history",
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
