"""Streaming windowed analytics with watermarks (SURVEY §2.2: watermarks /
late data — ABSENT in reference, built-in here).

These are the streaming forms of plans/events.py: identical logical
expressions, incrementalized by Structured Streaming. The watermark bounds
both state size and late-data admission: events later than the watermark
delay are dropped, everything earlier is aggregated exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling event-time window per event_type with late-data bound.
    Append output mode: a window emits once, when the watermark passes its
    end — state is dropped immediately after."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding event-time window per event_type: each event lands in
    window/slide overlapping windows (Spark expands them JVM-side); state per
    open window, dropped at watermark passage like the tumbling form."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Per-user session windows (gap-based, data-driven close): the streaming
    form of plans/events.py events_session_window. Session state MERGES as
    events arrive (windows with < gap separation coalesce) and closes when
    the watermark passes last_event + gap — this is the one window type
    whose extent is decided by the DATA, so watermarking is what bounds
    state: without it sessions for idle users would stay open forever."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def streaming_dedup(
    changes: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Exactly-once-per-key delivery over an at-least-once stream:
    dropDuplicatesWithinWatermark absorbs source replays (the reference's
    offset-commit cadence makes replays of the last event group possible,
    src/main.rs:238-255).

    The dedup key includes a PAYLOAD digest (xxhash64 of the before/after
    images), not just (db, table, key, ts, op): ts is epoch seconds, so two
    genuinely distinct Updates to one key within the same second are NOT a
    replay — without the digest the second would be silently dropped (data
    loss). A true replay re-delivers byte-identical images and still
    collapses."""
    from cdc_rs_spark.envelope import pkey_value

    keyed = (
        changes.withColumn("key", pkey_value(changes))
        .withColumn("event_time", F.timestamp_seconds(F.col("ts")))
        .withColumn(
            "payload_digest",
            F.xxhash64(
                F.to_json(F.struct(F.col("before"), F.col("after")))
            ),
        )
    )
    return keyed.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        ["db", "table", "key", "ts", "op", "payload_digest"]
    )
