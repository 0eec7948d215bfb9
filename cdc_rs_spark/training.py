"""The composed training-data product: one call from raw corpus to loader-
ready shards.

Every stage exists as a tested, oracle-checked operator elsewhere in the
engine (the registry pins each one's semantics individually); this module is
the ASSEMBLY a data-curation user actually runs — the C4/RefinedWeb-style
funnel:

    raw docs
      -> PII scrub               (redact emails/URLs; functions/text style)
      -> quality gate            (functions/text.quality_score >= min)
      -> exact dedup             (operators/dedup.exact_dedup on text)
      -> near-dup dedup          (MinHash-LSH pairs -> connected components
                                  -> keep each cluster's min-id canonical)
      -> deterministic shards    (sources/sinks.write_training_shards:
                                  md5-bucket shard + in-shard order + manifest)

Scale shape is inherited from the parts: scrub/quality are map-side column
expressions; exact dedup is one key shuffle; near-dup is banded LSH (never
N^2) + label propagation; the shard write is one repartition by shard. The
only driver traffic is the per-stage survival COUNT (one scalar per stage —
the funnel report IS the product's receipt) and the n_shards-row manifest.

Determinism: every decision is a pure function of document content/ids (md5
buckets, min-id canonicals, deterministic shard order), so a re-run over the
same corpus produces byte-identical shard manifests — retry- and
speculation-safe at any scale (asserted in tests/test_pipeline.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_rs_spark.functions.text import quality_score
from cdc_rs_spark.operators.dedup import exact_dedup, minhash_dedup_pairs
from cdc_rs_spark.operators.graph import connected_components
from cdc_rs_spark.sources.sinks import write_training_shards

# same redaction patterns as the pii_scrub_documents registry query
# (plans/pipeline.py) — chosen to behave identically in Java regex and RE2
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
_URL_RE = r"https?://[^ ]+"


def scrub_pii(text):
    return F.regexp_replace(
        F.regexp_replace(text, _EMAIL_RE, "<EMAIL>"), _URL_RE, "<URL>"
    )


@dataclass
class TrainingSetConfig:
    n_shards: int = 8
    quality_min: float = 0.25
    near_dup_threshold: float = 0.5
    id_col: str = "doc_id"
    text_col: str = "text"


def build_training_set(
    docs: DataFrame, out_dir: str, cfg: TrainingSetConfig | None = None
) -> list[tuple[str, int]]:
    """Run the full curation funnel over `docs` and write loader-ready
    shards + manifest to `out_dir`. Returns the funnel as
    [(stage, surviving_docs), ...] — monotonically non-increasing by
    construction."""
    cfg = cfg or TrainingSetConfig()
    idc, txt = cfg.id_col, cfg.text_col
    funnel: list[tuple[str, int]] = [("raw", docs.count())]

    scrubbed = docs.withColumn(txt, scrub_pii(F.col(txt)))
    # scrub rewrites content, never drops rows — no count step needed

    gated = scrubbed.filter(quality_score(F.col(txt)) >= cfg.quality_min)
    funnel.append(("quality_gate", gated.count()))

    exact = exact_dedup(gated, [txt], idc)
    funnel.append(("exact_dedup", exact.count()))

    pairs = minhash_dedup_pairs(exact, idc, txt, threshold=cfg.near_dup_threshold)
    comps = connected_components(pairs, "id_a", "id_b")
    # keep every untouched doc plus each cluster's min-id canonical
    drop = comps.filter(F.col("v") != F.col("component")).select(
        F.col("v").alias(idc)
    )
    kept = exact.join(drop, idc, "left_anti")
    funnel.append(("near_dedup", kept.count()))

    write_training_shards(kept, out_dir, n_shards=cfg.n_shards, id_col=idc)
    funnel.append(("sharded", kept.count()))
    return funnel
