"""Multimodal query inventory (EXTENSION): binary payload plumbing through
Arrow-batched mapInPandas, oracle-checked via the deterministic fake decoder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cdc_rs_spark.functions.hashing import fp_sql
from cdc_rs_spark.operators.multimodal import (
    AUDIO_BYTES_PER_MS,
    AUDIO_FRAME_BYTES,
    VIDEO_FRAME_BYTES,
    attach_payload,
    fake_audio_features,
    fake_image_meta,
    sample_video_frames,
)
from cdc_rs_spark.registry import register
from cdc_rs_spark.session import load, spread


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
    d = spread(load(spark, sf_dir, "documents"))
    return fake_image_meta(attach_payload(d))


@register(
    "multimodal_audio_features",
    oracle=f"""
    SELECT doc_id,
           octet_length(encode(text))::BIGINT AS n_bytes,
           (octet_length(encode(text))::BIGINT + {AUDIO_FRAME_BYTES - 1})
             // {AUDIO_FRAME_BYTES} AS frame_count,
           octet_length(encode(text))::BIGINT // {AUDIO_BYTES_PER_MS} AS duration_ms,
           {fp_sql("text")} AS checksum
    FROM documents
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-shape plumbing: binary payload -> mapInPandas feature extract
    (frame count, fake-PCM duration, 60-bit md5 checksum). The checksum
    proves the exact payload bytes crossed the Arrow boundary intact —
    DuckDB recomputes it from the source text."""
    d = spread(load(spark, sf_dir, "documents"))
    return fake_audio_features(attach_payload(d))


@register(
    "multimodal_video_frames",
    oracle=f"""
    WITH idx AS (
        SELECT doc_id,
               octet_length(encode(text))::BIGINT AS n,
               unnest(generate_series(
                   0,
                   (octet_length(encode(text))::BIGINT - 1) // {VIDEO_FRAME_BYTES},
                   4)) AS frame_idx
        FROM documents
    )
    SELECT doc_id, frame_idx,
           frame_idx * {VIDEO_FRAME_BYTES} AS frame_offset,
           least({VIDEO_FRAME_BYTES}, n - frame_idx * {VIDEO_FRAME_BYTES}) AS frame_len
    FROM idx
    """,
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-frame sampling plumbing: every 4th fixed-size frame of the
    payload emitted as its own row (1 row in -> N rows out through
    mapInPandas — the keyframe-sampler UDTF shape)."""
    d = spread(load(spark, sf_dir, "documents"))
    return sample_video_frames(attach_payload(d), stride=4)


@register(
    "multimodal_image_decode",
    oracle="""
    SELECT doc_id,
           33::BIGINT AS n_bytes,
           (1 + doc_id % 1920)::BIGINT AS width,
           (1 + doc_id % 1080)::BIGINT AS height,
           'PNG' AS format
    FROM documents
    """,
)
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decoding through the Arrow boundary (no fake decoder):
    a valid PNG header is synthesized per document JVM-side (concat of magic
    + IHDR with dimensions derived from doc_id), then
    operators/multimodal.py:decode_image parses width/height/format back out
    of the binary payload in mapInPandas. The oracle predicts the dimensions
    arithmetically — a decoder bug or any byte corruption across Arrow
    surfaces as a mismatch. 33 bytes = 8 magic + 25 IHDR chunk."""
    from pyspark.sql import functions as F

    from cdc_rs_spark.operators.multimodal import decode_image

    d = spread(load(spark, sf_dir, "documents"))
    width = (F.lit(1) + F.col("doc_id") % 1920).cast("int")
    height = (F.lit(1) + F.col("doc_id") % 1080).cast("int")

    def be4(col):  # 4-byte big-endian of a non-negative int column
        return F.unhex(F.lpad(F.hex(col), 8, "0"))

    png = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A")),          # PNG magic
        F.unhex(F.lit("0000000D")),                   # IHDR length 13
        F.encode(F.lit("IHDR"), "UTF-8"),
        be4(width),
        be4(height),
        F.unhex(F.lit("0802000000")),                 # bit depth/color/etc
        F.unhex(F.lit("00000000")),                   # CRC (unchecked)
    )
    payloads = d.select("doc_id", png.alias("payload"))
    return decode_image(payloads)


@register(
    "multimodal_payload_dedup",
    oracle="""
    WITH hashed AS (
        SELECT doc_id,
               md5(substr(text, 1, 64)) AS head_hash,
               md5(text) AS full_hash
        FROM documents
    )
    SELECT head_hash,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(COUNT(DISTINCT full_hash) AS BIGINT) AS n_distinct_payloads,
           CAST(MIN(doc_id) AS BIGINT) AS keeper
    FROM hashed
    GROUP BY head_hash
    HAVING COUNT(*) >= 2
    """,
)
def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash media dedup over the opaque binary payload: group by a
    64-byte HEAD fingerprint (the chunk-hash trick — truncated/re-encoded
    copies of the same source share their header bytes long before a
    full-content hash would match), and report per group how many payloads
    are byte-identical end-to-end (n_distinct_payloads = 1 means the whole
    group is one file). Both hashes are computed map-side next to the
    storage scan; the shuffle carries (hash, doc_id) pairs only — never
    payload bytes — which is what makes this viable over 100 TB of media.
    The fixture payload is ASCII, so the oracle's substr-by-chars equals
    the operator's substring-by-bytes."""
    d = spread(load(spark, sf_dir, "documents"))
    from pyspark.sql import functions as F

    hashed = attach_payload(d).select(
        "doc_id",
        F.md5(F.expr("substring(payload, 1, 64)")).alias("head_hash"),
        F.md5("payload").alias("full_hash"),
    )
    return (
        hashed.groupBy("head_hash")
        .agg(
            F.count("*").cast("bigint").alias("n_copies"),
            F.countDistinct("full_hash").cast("bigint").alias("n_distinct_payloads"),
            F.min("doc_id").cast("bigint").alias("keeper"),
        )
        .filter(F.col("n_copies") >= 2)
    )
