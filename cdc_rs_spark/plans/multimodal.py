"""Multimodal query inventory (EXTENSION): binary payload plumbing through
Arrow-batched mapInPandas, oracle-checked via the deterministic fake decoder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cdc_rs_spark.operators.multimodal import attach_payload, fake_image_meta
from cdc_rs_spark.registry import register
from cdc_rs_spark.session import load


@register(
    "multimodal_image_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))::BIGINT AS n_bytes,
           octet_length(encode(text))::BIGINT % 640 AS width,
           (octet_length(encode(text))::BIGINT * 7) % 480 AS height,
           'fake/deterministic' AS format
    FROM documents
    """,
)
def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> mapInPandas 'decode' -> typed metadata. The fake
    decoder's outputs are pure functions of payload length, so the oracle
    can verify the whole Arrow round-trip."""
    d = load(spark, sf_dir, "documents")
    return fake_image_meta(attach_payload(d))
