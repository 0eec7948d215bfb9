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
    # ROUND-9 ROTATION (VERDICT r8 next #8, the r8 discipline): pin every
    # round-9 NEW and CHANGED query first, then rotate older slots for
    # repeat greens with family spread. Cumulative driver coverage is
    # 201/201 through r8; rotated-out queries keep their module order
    # after slot 50 and stay verified locally
    # (CORRECTNESS_LOCAL_FULL.json via tools/driver_sim.py).
    #
    # NEW this round — the eight round-9 operators pin at birth:
    # content-defined-anchor exact-substring dedup + its shift-invariance
    # proof, full coreness decomposition, residual IVF-PQ (batch /
    # streaming / recall eval), dHash perceptual image near-dup, and the
    # end-to-end streaming curation funnel
    "curation_funnel_incremental",
    "dedup_exact_substring_anchored",
    "dedup_anchor_shift_invariance",
    "part_coreness",
    "dedup_anchor_cut_rewrite",  # r9 new (anchored span-cut rewrite)
    "dedup_anchor_store_probe",  # r9 new (anchored incremental store probe)
    "sample_coreness_weighted",  # r9 new (coreness-weighted priority draw)
    "similarity_ivfpq_residual_topk",
    "similarity_ivfpq_residual_incremental_topk",
    "similarity_ivfpq_residual_recall_eval",
    "multimodal_image_near_dup",
    "text_bigram_lm_score",  # r9 new (ln-free bigram LM quality filter)
    "text_bigram_lm_incremental",  # r9 new (streaming LM training, shared oracle)
    # CHANGED this round (re-pin): nb_score gained the size-gated join
    # (operators/classify.py); streaming/ivf.py gained residual mode and
    # the probe schema grew the qc column; pq_adc_rank gained with_qc;
    # the incremental families gained benchphase build markers; the
    # stride span report shares operators/dedup.py with the new anchored
    # sampler; text_cleaning_funnel's gates are now shared with the
    # streaming funnel via funnel_gates
    "text_nb_source_classifier",
    "text_nb_incremental_classifier",
    "similarity_ivf_incremental_topk",
    # similarity_ivfpq_incremental_topk rotated out late-session like its
    # siblings above: the pinned residual incremental form drives the
    # identical streaming/ivf.py code path with pq=True

    # similarity_pq_adc_topk / similarity_ivfpq_topk rotated out
    # late-session: their encode/ADC chains are driver-exercised through
    # the pinned residual + incremental + recall-eval siblings (same
    # code paths in operators/similarity.py and plans/similarity.py),
    # and the slots fund the session's new-family pins
    "similarity_ivfpq_recall_eval",
    "dedup_incremental_clusters",
    "heavy_hitters_cms_incremental",
    # dedup_exact_substring_spans rotated out likewise: the shared
    # sampler is driver-exercised through the three pinned anchored
    # variants

    # text_cleaning_funnel rotated out late-session: its gate composition
    # is driver-verified through curation_funnel_incremental (shared
    # funnel_gates), and the slot funds the model-eval pins below

    # dedup_connected_components rides with the incremental form — the
    # two share one oracle, so the driver checks both sides of the
    # incremental == batch claim every round
    "dedup_connected_components",
    # NEW in round-9 session 2 — pinned at birth: BPE training + encoding
    # (tokenizer fertility audit), label-propagation communities, the
    # register-exact streaming HLL, the Bloom runtime-join-filter audit,
    # the MAD robust outlier gate, the JL random-projection distortion
    # audit, and video scene-cut detection
    "text_bpe_train_merges",
    "text_bpe_encode_fertility",
    "part_community_lpa",
    "hll_incremental_distinct",
    "join_bloom_prefilter_audit",
    "outlier_mad_robust_lineitem",
    "embedding_random_projection_audit",
    "multimodal_video_scene_cuts",
    # NEW in round-9 session 2, second batch — pinned at birth: CUSUM
    # change-point detection, day-of-week seasonality, VAD run-length
    # segmentation, Apriori frequent triples, and the streaming
    # histogram-quantile store (the ADD-monoid quantile sketch)
    "anomaly_cusum_daily_revenue",
    "seasonality_dow_revenue",
    "multimodal_audio_vad_segments",
    "basket_frequent_triples",
    "quantile_histogram_incremental",
    # NEW in round-9 session 2, third batch — pinned at birth: multi-format
    # IO round-trip fidelity, l-diversity privacy audit, Matryoshka
    # prefix-truncation retrieval audit, Zipf conformance gate
    "io_format_roundtrip_checksum",
    "l_diversity_audit_customer",
    "embedding_matryoshka_truncation_audit",
    "text_zipf_rank_ratio_audit",
    # NEW in round-9 session 2, fourth batch — pinned at birth: item-item
    # CF recommendations and the lossless prefix-filtered exact Jaccard
    # join (the deterministic complement of MinHash-LSH)
    "basket_item_cf_topk",
    "dedup_jaccard_prefix_join",
    # NEW in round-9 session 2, fifth batch — pinned at birth: association
    # rules (confidence/lift), multi-source BFS hop distances, and
    # regex-CEP sequence patterns over journey strings
    "basket_association_rules",
    "part_bfs_distance",
    "events_pattern_regex_cep",
    # NEW in round-9 session 2, sixth batch — pinned at birth: censoring-
    # aware Kaplan-Meier conversion curve and the composed entity-
    # resolution pipeline (block -> match -> closure -> canonicalize)
    "events_survival_km",
    "supplier_entity_clusters",
    # NEW in round-9 session 2, seventh batch — pinned at birth: exact
    # model-eval metrics for the learned filter (tie-corrected AUC over
    # the margin distribution, NTILE-exact decile gains)
    "text_nb_auc_eval",
    "text_nb_decile_lift",
    # NEW in round-9 session 2, eighth batch — pinned at birth: degree
    # power-law audit (the hub-salting decision input), Poisson burst
    # detection, and inter-arrival bot-regularity scoring
    "part_degree_powerlaw_audit",
    "events_poisson_rate_anomaly",
    "events_bot_regularity_score",
    # NEW in round-9 session 2, ninth batch — pinned at birth: RAKE
    # keyphrase extraction (co-occurrence degree/freq scoring)
    "text_rake_keyphrases",
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
