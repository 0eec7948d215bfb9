"""Event-stream analytics over the `events` fixture (SURVEY §2.2: streaming
windows — ABSENT in reference, provided as Spark built-ins).

These run in batch mode here for oracle-checkability; the identical
expressions run incrementally under Structured Streaming (same DataFrame ops,
incrementalized — see cdc_rs_spark/streaming/ for the readStream versions with
watermarks; Structured Streaming's core design point is that these are the
same logical plans).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_rs_spark.functions.timeutil import epoch_ms, epoch_us
from cdc_rs_spark.plans.relational import dsum
from cdc_rs_spark.registry import register
from cdc_rs_spark.session import load


@register(
    "events_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window per event type."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value")).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )


@register(
    "events_sliding_window",
    oracle="""
    WITH assigned AS (
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS b, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, value
        FROM events
    )
    SELECT b AS window_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM assigned
    GROUP BY 1
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour length, 30-minute slide — each event lands in
    two windows. The oracle expands the two bucket assignments explicitly."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), dsum(F.col("value")).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


@register(
    "events_session_window",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) > INTERVAL 30 MINUTE THEN 1
                    WHEN lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) IS NULL THEN 1
                    ELSE 0 END AS is_new
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_no
        FROM ordered
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_ts,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_no
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user — Spark's
    built-in session_window; the oracle is the classic gaps-and-islands SQL."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_ts"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start", "last_ts", "n_events")
    )


@register(
    "events_json_props",
    oracle="""
    SELECT CAST(props->>'$.k' AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the props column (reference analog: JSON
    serialization boundary, src/main.rs:421) + aggregation."""
    e = load(spark, sf_dir, "events")
    return (
        e.withColumn(
            "k_bucket", F.get_json_object("props", "$.k").cast("bigint") % 10
        )
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), dsum(F.col("value")).alias("total_value"))
    )


@register(
    "events_rate_per_type_window",
    oracle="""
    WITH hourly AS (
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS h, event_type,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT h AS window_start, event_type, n,
           n - lag(n) OVER (PARTITION BY event_type ORDER BY h) AS delta
    FROM hourly
    """,
)
def events_rate_per_type_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-rate stats over the event stream (SURVEY §2.2 aggregations
    EXTENSION row: per-type change-rate): hourly counts + delta vs previous
    hour via lag window."""
    e = load(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    w = Window.partitionBy("event_type").orderBy("window_start")
    return hourly.withColumn("delta", F.col("n") - F.lag("n").over(w))


@register(
    "events_asof_last_click",
    oracle="""
    WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         r AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT event_id, user_id, ts, click_id, click_ts FROM (
        SELECT l.event_id, l.user_id, l.ts,
               r.event_id AS click_id, r.ts AS click_ts,
               row_number() OVER (PARTITION BY l.event_id
                                  ORDER BY r.ts DESC, r.event_id DESC) AS rn
        FROM l LEFT JOIN r ON r.user_id = l.user_id AND r.ts <= l.ts
    ) WHERE rn = 1
    """,
)
def events_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of backward join (SURVEY §2.2 joins row — as-of variant): for each
    purchase event, the same user's most recent click at-or-before it.
    Union+window formulation: one shuffle on user_id, no join explosion —
    see operators/asof.py for the scale analysis. The oracle uses the naive
    quadratic LEFT JOIN + rank form, which is exactly what this operator
    avoids executing."""
    from cdc_rs_spark.operators.asof import asof_join_backward

    e = load(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    right = e.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts"), F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    return asof_join_backward(
        left, right, on=["user_id"], left_time="ts", right_time="ts",
        payload_cols=["click_ts", "click_id"],
    ).select("event_id", "user_id", "ts", "click_id", "click_ts")


@register(
    "events_range_join_bucketed",
    oracle="""
    SELECT p.event_id AS purchase_id, e.event_id AS error_id, p.user_id,
           ROUND(date_diff('millisecond', p.ts, e.ts) / 1000.0, 3) AS dt_sec
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id
     AND e.ts >= p.ts
     AND e.ts <  p.ts + INTERVAL 60 MINUTE
    """,
)
def events_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join with the bucketed scale path: errors within 60
    minutes after a purchase by the same user.

    Naive form (what the oracle runs): equi-join on user then a time-range
    residual — per-user quadratic. Scale path here: bin both sides into
    buckets exactly as wide as the range (60 min), equi-join on
    (user_id, bucket) with each left row duplicated into its 2 reachable
    buckets [b, b+1], then apply the exact range residual. Shuffle keys are (user, bucket) — candidate pairs are
    bounded by per-bucket density, never per-user history. The bucket width
    equals the range width: exactly 2 probes, the standard trick Spark's
    own range-join hints (DBR) and ASOF implementations use."""
    e = load(spark, sf_dir, "events")
    one_hour_us = 60 * 60 * 1_000_000
    bucket = (epoch_us("ts") / F.lit(one_hour_us)).cast("long")
    p = (
        e.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts"))
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    (epoch_us("p_ts") / one_hour_us).cast("long"),
                    (epoch_us("p_ts") / one_hour_us).cast("long") + 1,
                )
            ),
        )
    )
    err = (
        e.filter(F.col("event_type") == "error")
        .select(F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("e_ts"))
        .withColumn("bucket", (epoch_us("e_ts") / one_hour_us).cast("long"))
    )
    dt_us = epoch_us("e_ts") - epoch_us("p_ts")
    return (
        p.join(err, ["user_id", "bucket"])
        .filter((dt_us >= 0) & (dt_us < one_hour_us))
        .select(
            "purchase_id",
            "error_id",
            "user_id",
            F.round(
                (epoch_ms("e_ts") - epoch_ms("p_ts")) / F.lit(1000.0),
                3,
            ).alias("dt_sec"),
        )
    )


@register(
    "events_hierarchical_rollup",
    oracle="""
    WITH hourly AS (
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS h, event_type,
               COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(18,2))) AS v
        FROM events GROUP BY 1, 2
    )
    SELECT CAST(date_trunc('day', h) AS TIMESTAMP) AS day, event_type,
           CAST(SUM(n) AS BIGINT) AS n,
           CAST(SUM(v) AS DOUBLE) AS total_value
    FROM hourly GROUP BY 1, 2
    """,
)
def events_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical rollup: daily aggregates derived from
    the HOURLY rollup, not the raw events — the continuous-aggregate reuse
    pattern (aggregate once at fine grain; coarser grains are sums of sums,
    exact because counts and decimal sums are algebraic). At 100 TB the
    hourly table is ~1e5x smaller than raw events; the daily pass touches
    only it."""
    e = load(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("v"),
        )
        .select(F.col("w.start").alias("h"), "event_type", "n", "v")
    )
    return (
        hourly.groupBy(F.date_trunc("day", F.col("h")).alias("day"), "event_type")
        .agg(F.sum("n").alias("n"), F.sum("v").cast("double").alias("total_value"))
    )


@register(
    "orders_rolling_7day_revenue",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS rev
        FROM orders GROUP BY d
    )
    SELECT d, CAST(rev AS DOUBLE) AS rev,
           CAST(SUM(rev) OVER (
               ORDER BY (d - DATE '1970-01-01')
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rev_7d
    FROM daily
    """,
)
def orders_rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day revenue via a RANGE window frame over epoch-day numbers
    (value-based frame — gaps in the calendar are handled correctly, unlike a
    ROWS frame). Aggregating to the daily series FIRST bounds the windowed
    relation to #days rows, so the unpartitioned window is safe at any corpus
    scale — the groupBy does the distributed heavy lifting."""
    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("rev")
        )
    )
    days = F.datediff(F.col("d"), F.lit("1970-01-01"))
    w = Window.orderBy(days).rangeBetween(-6, 0)
    # accumulate exact decimals; emit hash-stable doubles (driver canon)
    return daily.withColumn(
        "rev_7d", F.sum("rev").over(w).cast("decimal(38,2)").cast("double")
    ).withColumn("rev", F.col("rev").cast("double"))


@register(
    "events_funnel_conversion",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MIN(ts) FILTER (WHERE event_type = 'view') AS first_view,
               MIN(ts) FILTER (WHERE event_type = 'click') AS first_click,
               MIN(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
        FROM events GROUP BY user_id
    )
    SELECT COUNT(first_view) AS n_view,
           COUNT(*) FILTER (WHERE first_view < first_click) AS n_view_click,
           COUNT(*) FILTER (
               WHERE first_view < first_click AND first_click < first_purchase
           ) AS n_full_funnel
    FROM per_user
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch funnel (view -> click -> purchase): one conditional-agg
    pass per user, then one global roll-up — two shuffles total, no joins,
    no per-stage scans. NULL timestamps (< is NULL-rejecting) drop users who
    never reached a stage, in both engines identically."""
    e = load(spark, sf_dir, "events")

    def first(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = e.groupBy("user_id").agg(
        first("view").alias("first_view"),
        first("click").alias("first_click"),
        first("purchase").alias("first_purchase"),
    )
    return per_user.agg(
        F.count("first_view").alias("n_view"),
        F.count(
            F.when(F.col("first_view") < F.col("first_click"), 1)
        ).alias("n_view_click"),
        F.count(
            F.when(
                (F.col("first_view") < F.col("first_click"))
                & (F.col("first_click") < F.col("first_purchase")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@register(
    "events_weekly_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT e.user_id, f.cohort,
               CAST(date_trunc('week', e.ts) AS DATE) AS wk
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort, CAST((wk - cohort) / 7 AS BIGINT) AS week_offset,
           COUNT(*) AS n_users
    FROM active GROUP BY cohort, week_offset
    """,
)
def events_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-seen ISO week, counted in
    each subsequent active week. The firsts table is small (one row per
    user) and broadcast; both engines truncate weeks to Monday (ISO)."""
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    active = (
        e.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort",
            F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
        )
        .distinct()
    )
    return active.groupBy(
        "cohort",
        F.floor(F.datediff("wk", "cohort") / 7).alias("week_offset"),
    ).agg(F.count("*").alias("n_users"))


@register(
    "events_salted_user_join",
    oracle="""
    SELECT e.user_id, c.c_name,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)
               AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY e.user_id, c.c_name
    """,
)
def events_salted_user_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant join end-to-end: the events fact (user_id is the
    skewed key — few users, many events) joins customer through
    operators/skew.py's salted_join (big side salted across 8 sub-keys,
    small side replicated), then aggregates. The oracle is the PLAIN join —
    salting must be invisible in the result, only in the shuffle layout."""
    from cdc_rs_spark.operators.skew import salted_join

    e = load(spark, sf_dir, "events").withColumnRenamed("user_id", "c_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    joined = salted_join(e, c, "c_custkey", salt=8)
    return (
        joined.groupBy(F.col("c_custkey").alias("user_id"), "c_name")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@register(
    "anomaly_zscore_daily_revenue",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(18,2)) AS rev
        FROM orders GROUP BY d
    ),
    win AS (
        SELECT d, rev,
               COUNT(*) OVER w AS n,
               CAST(SUM(rev) OVER w AS DECIMAL(38,2)) AS s,
               -- widen BEFORE squaring: DECIMAL(18) x DECIMAL(18) overflows
               -- DuckDB's int64 path once daily revenue passes ~9.2e7
               -- (hit at sf0.1); the int128 product is exact
               CAST(SUM(CAST(CAST(rev AS DECIMAL(28,2)) * rev
                             AS DECIMAL(38,4))) OVER w
                    AS DECIMAL(38,4)) AS q
        FROM daily
        WINDOW w AS (ORDER BY (d - DATE '1970-01-01')
                     RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
    )
    SELECT d, CAST(rev AS DOUBLE) AS rev,
           ROUND((CAST(rev AS DOUBLE) - CAST(s AS DOUBLE) / n)
                 / sqrt((CAST(q AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                        / (n - 1)), 6) AS z
    FROM win
    WHERE n > 7
      AND (CAST(q AS DOUBLE)
           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1) > 0
      AND abs((CAST(rev AS DOUBLE) - CAST(s AS DOUBLE) / n)
              / sqrt((CAST(q AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                     / (n - 1))) >= 2.0
    """,
)
def anomaly_zscore_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection on daily revenue (28-day trailing
    window). The distributed-stats discipline: the windowed SUM and
    SUM-OF-SQUARES accumulate in exact decimals, and mean/variance derive
    from those exact moments in one deterministic double expression — so the
    result is independent of partitioning and accumulation order, which
    stddev_samp over doubles is NOT. Fact table reduces to the daily series
    first; the window runs over #days rows."""
    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("rev")
    )
    days = F.datediff(F.col("d"), F.lit("1970-01-01"))
    w = Window.orderBy(days).rangeBetween(-27, 0)
    win = daily.select(
        "d",
        "rev",
        F.count("*").over(w).alias("n"),
        F.sum("rev").over(w).cast("decimal(38,2)").alias("s"),
        F.sum((F.col("rev") * F.col("rev")).cast("decimal(38,4)"))
        .over(w)
        .cast("decimal(38,4)")
        .alias("q"),
    )
    n = F.col("n")
    mean = F.col("s").cast("double") / n
    var = (
        F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / n
    ) / (n - 1)
    z = (F.col("rev").cast("double") - mean) / F.sqrt(var)
    return (
        win.filter((n > 7) & (var > 0) & (F.abs(z) >= 2.0))
        .select("d", F.col("rev").cast("double").alias("rev"), F.round(z, 6).alias("z"))
    )


@register(
    "events_asof_next_purchase",
    oracle="""
    SELECT c.event_id, c.user_id, c.ts, MIN(p.ts) AS next_purchase_ts
    FROM events c LEFT JOIN events p
      ON p.user_id = c.user_id AND p.event_type = 'purchase' AND p.ts >= c.ts
    WHERE c.event_type = 'click'
    GROUP BY c.event_id, c.user_id, c.ts
    """,
)
def events_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (operators/asof.py): for every click, the next
    purchase by the same user at-or-after it — time-to-conversion's raw
    material. The oracle is the naive O(n^2) correlated join; the operator is
    the union+window sort-merge form (one key shuffle, no join explosion)."""
    from cdc_rs_spark.operators.asof import asof_join_forward

    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    out = asof_join_forward(
        clicks,
        purchases.withColumn("next_purchase_ts", F.col("p_ts")),
        ["user_id"],
        "ts",
        "p_ts",
        ["next_purchase_ts"],
    )
    return out.select("event_id", "user_id", "ts", "next_purchase_ts")


@register(
    "events_next_event_training_pairs",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, event_type,
               lag(event_type, 3) OVER w AS ctx1,
               lag(event_type, 2) OVER w AS ctx2,
               lag(event_type, 1) OVER w AS ctx3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           ctx1 || '>' || ctx2 || '>' || ctx3 AS context,
           event_type AS label
    FROM ordered
    WHERE ctx1 IS NOT NULL
    """,
)
def events_next_event_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-model training-example construction: each event becomes a
    (context, label) pair where context = the user's previous 3 event types
    in order — the classic next-event-prediction dataset build. One window
    shuffle on user_id (the same key every sessionization op shuffles on);
    lag() needs no buffering beyond the frame, and examples stay co-located
    with their user for a downstream group-aware split
    (train_test_split_group_aware)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ctx = [F.lag("event_type", k).over(w) for k in (3, 2, 1)]
    return (
        ev.select(
            "user_id",
            "event_id",
            F.concat_ws(">", *ctx).alias("context"),
            F.col("event_type").alias("label"),
            ctx[0].alias("_c1"),
        )
        .filter(F.col("_c1").isNotNull())
        .drop("_c1")
    )


@register(
    "events_daily_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
        FROM events
    ),
    days AS (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (
        SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT d.day, t.event_type,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events,
           (a.n IS NULL) AS gap_filled
    FROM days d CROSS JOIN types t
    LEFT JOIN actual a ON a.day = d.day AND a.event_type = t.event_type
    """,
)
def events_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: a dense (day x event_type) scaffold left-joined
    to actual daily counts, zero-filling missing combinations — what every
    downstream rate/anomaly computation needs (a missing day must read as 0,
    not NaN; cf. anomaly_zscore_daily_revenue which assumes a dense series).
    The scaffold is generated from TWO 1-row broadcasts (min/max date) and a
    distinct-types dim — never materialized on the driver. The hint sits on
    the AGGREGATED side (also |days x types|-bounded): a left-outer join
    can only build its non-preserved side, so hinting the scaffold (the
    preserved left) was a no-op Spark warned about every run (ADVICE/
    VERDICT r10's HintErrorLogger nit, root-caused here in r11)."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    types = ev.select("event_type").distinct()
    actual = ev.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type")
    ).agg(F.count("*").alias("n"))
    scaffold = days.crossJoin(types)
    return (
        scaffold
        .join(F.broadcast(actual), ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
            F.col("n").isNull().alias("gap_filled"),
        )
    )


@register(
    "events_concurrent_sessions",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) > INTERVAL 30 MINUTE THEN 1
                    WHEN lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) IS NULL THEN 1
                    ELSE 0 END AS is_new
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_no
        FROM ordered
    ),
    sessions AS (
        SELECT user_id, session_no, MIN(ts) AS s0, MAX(ts) AS s1
        FROM numbered GROUP BY user_id, session_no
    ),
    points AS (
        SELECT s0 AS pts, 1 AS delta FROM sessions
        UNION ALL SELECT s1, -1 FROM sessions
    ),
    curve AS (
        SELECT pts, delta,
               SUM(delta) OVER (ORDER BY pts, delta
                                ROWS UNBOUNDED PRECEDING) AS concurrency
        FROM points
    )
    SELECT CAST(pts AS DATE) AS day,
           CAST(MAX(concurrency) AS BIGINT) AS peak_concurrency
    FROM curve GROUP BY 1
    """,
)
def events_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day via the interval +1/-1 sweep: each
    session contributes (+1 at start, -1 at last event); the running sum
    over (ts, delta) — closings sort before openings at a shared instant,
    so touching sessions don't count as concurrent — IS the concurrency
    curve, and its per-day max is the capacity-planning number. Sweep
    points number 2x|sessions| — data-sized at scale — so the running sum
    is the two-pass range-bucketed cumsum (operators/ranged.py, round 3):
    no Exchange SinglePartition anywhere. The per-day MAX is insensitive
    to order within equal (ts, delta) tie blocks (a run of m equal +1s
    contributes the same prefix-value set in any order), so the bucketed
    form is exactly the oracle's sequential sweep."""
    from cdc_rs_spark.operators.ranged import global_cumsum, ranked_result

    e = load(spark, sf_dir, "events")
    sessions = (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.min("ts").alias("s0"), F.max("ts").alias("s1"))
    )
    points = sessions.select(
        F.col("s0").alias("pts"), F.lit(1).alias("delta")
    ).unionByName(sessions.select(F.col("s1").alias("pts"), F.lit(-1).alias("delta")))
    points = points.withColumn("k", epoch_us("pts"))

    def build(cached):
        curve = global_cumsum(
            cached,
            "k",
            [F.asc("k"), F.asc("delta")],
            "delta",
            out_col="concurrency",
        )
        return curve.groupBy(F.to_date("pts").alias("day")).agg(
            F.max("concurrency").cast("bigint").alias("peak_concurrency")
        )

    return ranked_result(points, build)


@register(
    "events_debounce",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               date_diff('millisecond',
                         lag(ts) OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id),
                         ts) AS gap_ms
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(COUNT(*) FILTER (WHERE gap_ms < 60000) AS BIGINT)
               AS n_suppressed,
           CAST(COUNT(*) FILTER (WHERE gap_ms IS NULL OR gap_ms >= 60000)
                AS BIGINT) AS n_kept
    FROM seq GROUP BY event_type
    """,
)
def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce / duplicate-burst suppression: an event is suppressed when
    the same user emitted the same event type less than 60 s earlier
    (lag-based gap; deterministic ts, event_id ordering). The batch analog of
    streaming_dedup's replay absorption (streaming/windows.py) for bursty
    client retries. One shuffle on (user_id, event_type) for the lag window —
    the partition key is the natural event-log bucketing key, so at 100 TB
    the window runs partition-local after a co-partitioned scan; the summary
    agg is map-side combinable."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap_ms = epoch_us("ts") - epoch_us(F.lag("ts").over(w))
    seq = e.select(
        "event_type", (gap_ms / 1000).alias("gap_ms")
    )
    return seq.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count(F.when(F.col("gap_ms") < 60000, 1))
        .cast("bigint")
        .alias("n_suppressed"),
        F.count(
            F.when(F.col("gap_ms").isNull() | (F.col("gap_ms") >= 60000), 1)
        )
        .cast("bigint")
        .alias("n_kept"),
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events
    ),
    cnt AS (
        SELECT src, dst, COUNT(*) AS n FROM seq
        WHERE dst IS NOT NULL GROUP BY src, dst
    )
    SELECT src, dst, n,
           n / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE) AS p
    FROM cnt
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream:
    P(next event type | current) per user-ordered sequence — the
    session-model / anomaly-baseline statistic. lead() pairs consecutive
    events with ONE shuffle on user_id; transition counts then collapse
    map-side to a |types|^2 matrix, so the probability window runs over a
    tiny aggregate, never the event log. Probability = int-exact counts +
    one correctly-rounded double division (engine-portable)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    cnt = seq.groupBy("src", "dst").agg(F.count("*").alias("n"))
    wsrc = Window.partitionBy("src")
    return cnt.select(
        "src",
        "dst",
        "n",
        (F.col("n") / F.sum("n").over(wsrc).cast("double")).alias("p"),
    )


_AB_RATE = "CAST(n_conv AS DOUBLE) / n_users"


@register(
    "events_ab_test_ztest",
    oracle="""
    WITH assigned AS (
        SELECT user_id,
               CAST(('0x' || substring(md5('ab1:' || CAST(user_id AS VARCHAR)), 1, 8))
                    AS UBIGINT) % 2 AS variant,
               MAX(CASE WHEN event_type = 'purchase' AND CAST(value AS DOUBLE) > 99
                        THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    arms AS (
        SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
               CAST(SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
        FROM assigned
    )
    SELECT n_a, n_b, conv_a, conv_b,
           ROUND(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
           ROUND(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
           CASE WHEN n_a > 0 AND n_b > 0
                 AND conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b
           THEN ROUND((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                 / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 4)
           ELSE NULL END AS z
    FROM arms
    """,
)
def events_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B significance test over the event log: users are
    deterministically hash-assigned to arms (salted md5 bucket — the same
    retry-stable assignment discipline as sample_hash_deterministic), the
    per-user conversion flag ("ever made a high-value purchase", value > 99 —
    non-degenerate in the fixture at every SF) reduces with ONE shuffle on
    user_id, and the two-arm contingency collapses map-side to a single row;
    the pooled z-statistic is one deterministic double expression over exact
    integer counts. At 100 TB the only data-sized stage is the per-user
    max() — mergeable, skew-free (user_id is high-cardinality)."""
    e = load(spark, sf_dir, "events")
    variant = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("ab1:"), F.col("user_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    assigned = (
        e.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value").cast("double") > 99),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
        .withColumn("variant", variant)
    )
    arms = assigned.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0)).cast("bigint").alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0)).cast("bigint").alias("conv_b"),
    )
    p_pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (F.col("n_a") + F.col("n_b"))
    rate_a = F.col("conv_a").cast("double") / F.col("n_a")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b")
    return arms.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        # total function: NULL on degenerate pools (all-zero/all-one
        # conversions, or an empty arm) where sqrt's argument is 0 — Spark
        # would emit null/Infinity while DuckDB errors; the guard (mirrored
        # in the oracle) makes both engines agree everywhere
        F.when(
            (F.col("n_a") > 0)
            & (F.col("n_b") > 0)
            & (F.col("conv_a") + F.col("conv_b") > 0)
            & (F.col("conv_a") + F.col("conv_b") < F.col("n_a") + F.col("n_b")),
            F.round(
                (rate_a - rate_b)
                / F.sqrt(
                    p_pool
                    * (F.lit(1.0) - p_pool)
                    * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
                ),
                4,
            ),
        ).alias("z"),
    )


@register(
    "events_user_gap_stats",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               date_diff('microsecond',
                         lag(ts) OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id),
                         ts) / 1000000.0 AS gap_s
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
           ROUND(quantile_cont(gap_s, 0.5), 6) AS median_gap_s,
           ROUND(quantile_cont(gap_s, 0.9), 6) AS p90_gap_s
    FROM seq GROUP BY event_type
    """,
)
def events_user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival statistics: per event type, the median and p90 gap (in
    seconds) between consecutive events of the same user — the churn /
    engagement-cadence primitive. One shuffle on (user_id, event_type) for
    the lag window (the event log's natural bucketing key, partition-local
    after a co-partitioned scan); the per-type exact percentile then runs
    over a |types|-group aggregate. At 100 TB swap percentile ->
    approx_percentile (mergeable t-digest) as documented for
    percentiles_per_flag."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap_s = (epoch_us("ts") - epoch_us(F.lag("ts").over(w))) / F.lit(1000000.0)
    seq = e.select("event_type", gap_s.alias("gap_s"))
    return seq.groupBy("event_type").agg(
        F.count("gap_s").cast("bigint").alias("n_gaps"),
        F.round(F.expr("percentile(gap_s, 0.5)"), 6).alias("median_gap_s"),
        F.round(F.expr("percentile(gap_s, 0.9)"), 6).alias("p90_gap_s"),
    )


_EWMA_INT_WEIGHTS = [2 ** (9 - k) for k in range(10)]  # 0.5^k scaled by 2^9


@register(
    "ewma_daily_revenue",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(18,2)) AS rev
        FROM orders GROUP BY d
    ),
    cents AS (
        SELECT d, rev, CAST(rev * 100 AS BIGINT) AS rc FROM daily
    ),
    lagged AS (
        SELECT d, rev,
               row_number() OVER (ORDER BY d) AS rn,
               {lags}
        FROM cents
    )
    SELECT d, CAST(rev AS DOUBLE) AS rev,
           CAST(({ewma}) AS DOUBLE) / 51200.0 AS ewma
    FROM lagged WHERE rn >= 10
    """.format(
        lags=",\n               ".join(
            f"lag(rc, {k}) OVER (ORDER BY d) AS r{k}" for k in range(10)
        ),
        ewma=" + ".join(
            f"r{k} * {w}" for k, w in enumerate(_EWMA_INT_WEIGHTS)
        ),
    ),
)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily revenue (decay 0.5,
    10-day horizon) as an explicit lag-chain — EWMA's recursion unrolled to
    a fixed linear combination so it is a pure window expression, not an
    iterative/stateful op. Determinism discipline: revenue is scaled to
    integer cents and the dyadic weights 0.5^k to integers 2^(9-k), so the
    whole combination is exact BIGINT arithmetic; ONE final correctly-
    rounded double division (by 100 * 2^9) produces the result — no
    floating accumulation, no ROUND tie-breaking, bit-identical across
    engines (cf. similarity.py int8 notes). The fact table collapses to
    the daily series first, so the unpartitioned window is |days|-sized at
    any scale; rows with incomplete history (first 9 days) are excluded
    rather than biased."""
    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("rev")
    )
    cents = daily.select(
        "d", "rev", (F.col("rev") * 100).cast("bigint").alias("rc")
    )
    w = Window.orderBy("d")
    lagged = cents.select(
        "d",
        "rev",
        F.row_number().over(w).alias("rn"),
        *[F.lag("rc", k).over(w).alias(f"r{k}") for k in range(10)],
    )
    ewma = F.col("r0") * F.lit(_EWMA_INT_WEIGHTS[0])
    for k in range(1, 10):
        ewma = ewma + F.col(f"r{k}") * F.lit(_EWMA_INT_WEIGHTS[k])
    return lagged.filter(F.col("rn") >= 10).select(
        "d",
        F.col("rev").cast("double").alias("rev"),
        (ewma.cast("double") / F.lit(51200.0)).alias("ewma"),
    )


@register(
    "events_user_growth_accounting",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events
        GROUP BY user_id
    ),
    daily AS (
        SELECT first_day AS d, CAST(COUNT(*) AS BIGINT) AS new_users
        FROM firsts GROUP BY first_day
    )
    SELECT d, new_users,
           CAST(SUM(new_users) OVER (ORDER BY d
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
    FROM daily
    """,
)
def events_user_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: new users per day (first-ever event) and the
    cumulative user count. A running COUNT(DISTINCT) is quadratic done
    naively; the first-seen reduction makes it linear — one shuffle on
    user_id for MIN(day), a |days|-sized daily rollup, and a cumulative
    window over that tiny series. Exact integers throughout."""
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    daily = firsts.groupBy(F.col("first_day").alias("d")).agg(
        F.count("*").cast("bigint").alias("new_users")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "d",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )


@register(
    "events_attribution_last_touch",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts, CAST(value AS DECIMAL(18,2)) AS rev
               FROM events WHERE event_type = 'purchase'),
         t AS (SELECT event_id, user_id, ts, event_type FROM events
               WHERE event_type <> 'purchase')
    SELECT touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(rev) AS DOUBLE) AS attributed_revenue
    FROM (
        SELECT p.event_id, p.rev, t.event_type AS touch_type,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY t.ts DESC, t.event_id DESC) AS rn
        FROM p JOIN t ON t.user_id = p.user_id AND t.ts <= p.ts
    ) WHERE rn = 1
    GROUP BY touch_type
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase's revenue is credited
    to the most recent preceding non-purchase event of the same user, then
    rolled up per touch type. Built on the as-of backward join
    (operators/asof.py — union+window, ONE shuffle on user_id, no join
    explosion; the oracle deliberately runs the naive quadratic join+rank
    form this operator avoids). Revenue accumulates in exact decimals."""
    from cdc_rs_spark.operators.asof import asof_join_backward

    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.col("value").cast("decimal(18,2)").alias("rev"),
    )
    touches = e.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", F.col("event_type").alias("touch_type"),
        F.col("event_id").alias("touch_id"),
    )
    attributed = asof_join_backward(
        purchases,
        touches,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        payload_cols=["touch_id", "touch_type"],
    ).filter(F.col("touch_type").isNotNull())
    return attributed.groupBy("touch_type").agg(
        F.count("*").cast("bigint").alias("n_purchases"),
        F.sum("rev").cast("double").alias("attributed_revenue"),
    )


@register(
    "events_quota_enforcement",
    oracle="""
    WITH ranked AS (
        SELECT CAST(ts AS DATE) AS day,
               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT day,
           CAST(COUNT(*) FILTER (WHERE rn <= 5) AS BIGINT) AS n_allowed,
           CAST(COUNT(*) FILTER (WHERE rn > 5) AS BIGINT) AS n_throttled,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM ranked GROUP BY day
    """,
)
def events_quota_enforcement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion quota / rate-limit enforcement: each user may land 5 events
    per day; later events (deterministic ts, event_id arrival order) are
    throttled. The batch form of a token-bucket admission gate — per
    (user, day) row_number against the quota, rolled up to a daily
    admission report. ONE shuffle on (user_id, day) for the ranking window
    (the log's natural bucketing key); the daily rollup is map-side
    combinable. The streaming analog keeps a per-key count in state with
    daily TTL (applyInPandasWithState, cf. streaming/arbitrate.py)."""
    e = load(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    w = Window.partitionBy("user_id", day).orderBy("ts", "event_id")
    ranked = e.select(day.alias("day"), F.row_number().over(w).alias("rn"))
    return ranked.groupBy("day").agg(
        F.count(F.when(F.col("rn") <= 5, 1)).cast("bigint").alias("n_allowed"),
        F.count(F.when(F.col("rn") > 5, 1)).cast("bigint").alias("n_throttled"),
        F.count("*").cast("bigint").alias("n_total"),
    )


@register(
    "events_conversion_latency_quantiles",
    oracle="""
    WITH conv AS (
        SELECT c.event_id, c.ts, MIN(p.ts) AS nts
        FROM events c LEFT JOIN events p
          ON p.user_id = c.user_id AND p.event_type = 'purchase'
         AND p.ts >= c.ts
        WHERE c.event_type = 'click'
        GROUP BY c.event_id, c.ts
    ),
    lat AS (
        SELECT (epoch_us(nts) - epoch_us(ts)) / 1000000.0 AS lat_s
        FROM conv WHERE nts IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_conversions,
           ROUND(quantile_cont(lat_s, 0.5), 6) AS p50_s,
           ROUND(quantile_cont(lat_s, 0.9), 6) AS p90_s,
           ROUND(quantile_cont(lat_s, 0.99), 6) AS p99_s
    FROM lat
    """,
)
def events_conversion_latency_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time-to-conversion SLO percentiles: click -> next purchase latency
    (forward as-of join), then EXACT p50/p90/p99 over the conversion
    latencies via the distributed-selection quantile
    (operators/quantiles.py) — demonstrating the operator over a DERIVED
    frame, not a base table: the as-of output is persisted so the
    selection's two passes share one materialization, then released.
    Latency is a ~unique continuous column (the exact case the
    buffer-everything percentile aggregate handles worst); the selection
    form stays bounded at any event volume. Spark's percentile
    interpolation is reproduced bit-for-bit, so the quantile_cont oracle
    hash-matches at 6 decimals."""
    from pyspark.storagelevel import StorageLevel

    from cdc_rs_spark.functions.timeutil import epoch_us
    from cdc_rs_spark.operators.asof import asof_join_forward
    from cdc_rs_spark.operators.quantiles import exact_quantiles

    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    conv = asof_join_forward(
        clicks,
        purchases.withColumn("nts", F.col("p_ts")),
        ["user_id"],
        "ts",
        "p_ts",
        ["nts"],
    ).filter(F.col("nts").isNotNull())
    lat = conv.select(
        ((epoch_us("nts") - epoch_us("ts")) / F.lit(1_000_000.0)).alias("lat_s")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n = lat.count()
        qs = exact_quantiles(lat, "lat_s", [0.5, 0.9, 0.99])
    finally:
        lat.unpersist(blocking=False)
    if n == 0:  # mirror the oracle: COUNT=0 row with NULL percentiles
        vals = "(0L, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))"
    else:
        p50, p90, p99 = qs[()]
        vals = f"({n}L, {p50!r}D, {p90!r}D, {p99!r}D)"
    return spark.sql(
        "SELECT CAST(col1 AS BIGINT) AS n_conversions, "
        "ROUND(col2, 6) AS p50_s, ROUND(col3, 6) AS p90_s, "
        "ROUND(col4, 6) AS p99_s FROM VALUES " + vals
    )


@register(
    "events_late_arrival_audit",
    oracle="""
    WITH ordered AS (
        SELECT event_type, ts,
               MAX(ts) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(('0x' || substring(md5(CAST(event_id AS
                       VARCHAR)), 1, 8)) AS UBIGINT) % 1000000, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS high_water
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(CASE WHEN ts < high_water THEN 1 END) AS n_late,
           ROUND(COUNT(CASE WHEN ts < high_water THEN 1 END)::DOUBLE
                 / COUNT(*), 6) AS late_frac
    FROM ordered GROUP BY event_type
    """,
)
def events_late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order-arrival audit (round 5): per event type, how many
    events arrive BEHIND their user's event-time high-water mark? The
    fixture generator emits events already time-ordered per user (verified:
    ZERO naturally-late rows at every scale — an audit keyed on event_id
    order would be vacuous, round-5 review), so the INGESTION order is
    simulated with the engine's deterministic md5 shuffle
    (corpus_shuffle_deterministic's permutation applied per user): the
    audit then measures a real lateness distribution through the exact
    same plan a production feed would use — on a real feed, swap the order
    key for the ingestion sequence. One shuffle on user_id (per-user
    partitions are naturally bounded, unlike lang strata); the running max
    is a rows-frame window, the rollup a map-side-combinable aggregate."""
    from cdc_rs_spark.plans.pipeline import hash_bucket

    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(hash_bucket(F.col("event_id"), 1_000_000), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late = F.col("ts") < F.max("ts").over(w)
    return (
        ev.select("event_type", late.alias("late"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count(F.when(F.col("late"), 1)).alias("n_late"),
            F.round(
                F.count(F.when(F.col("late"), 1)).cast("double") / F.count("*"), 6
            ).alias("late_frac"),
        )
    )


@register(
    "events_watermark_recommendation",
    oracle="""
    WITH ordered AS (
        SELECT event_id, event_type, ts,
               MAX(ts) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(('0x' || substring(md5(CAST(event_id AS
                       VARCHAR)), 1, 8)) AS UBIGINT) % 1000000, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS high_water
        FROM events
    ),
    late AS (
        SELECT event_id, event_type,
               epoch_us(high_water) - epoch_us(ts) AS late_us
        FROM ordered WHERE ts < high_water
    ),
    ranked AS (
        SELECT event_type, late_us,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY late_us, event_id) - 1 AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM late
    )
    SELECT event_type, MAX(n)::BIGINT AS n_late,
           MAX(CASE WHEN rk = floor((n - 1) * 0.5) THEN late_us END)
               AS p50_lateness_us,
           MAX(CASE WHEN rk = floor((n - 1) * 0.99) THEN late_us END)
               AS p99_lateness_us,
           MAX(late_us) AS max_lateness_us
    FROM ranked GROUP BY event_type
    """,
)
def events_watermark_recommendation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable half of events_late_arrival_audit (round 5): for each
    event type, the EXACT p50/p99/max lateness behind the user's event-time
    high-water mark under the simulated ingestion order (see the audit's
    docstring for why the order is a deterministic md5 shuffle) —
    p99_lateness_us IS the `withWatermark` delay that captures 99 % of
    stragglers, max is the lossless bound. Lateness is integer MICROSECONDS
    on both engines (epoch_us both sides — a seconds-truncating
    unix_timestamp against DuckDB's rounding epoch() diverged by ±1 s,
    round-5 review). Exact percentile-disc rank selection runs on
    operators/ranged.grouped_rank (the per-stratum two-pass primitive), so
    a dominant event type never funnels its lateness values through one
    task."""
    from cdc_rs_spark.functions.timeutil import epoch_us
    from cdc_rs_spark.operators.ranged import grouped_rank, ranked_result
    from cdc_rs_spark.plans.pipeline import hash_bucket

    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(hash_bucket(F.col("event_id"), 1_000_000), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hw = F.max("ts").over(w)
    late = (
        ev.select("event_id", "event_type", "ts", hw.alias("high_water"))
        .filter(F.col("ts") < F.col("high_water"))
        .select(
            "event_id",
            "event_type",
            (epoch_us("high_water") - epoch_us("ts")).alias("late_us"),
        )
    )

    def build(s: DataFrame) -> DataFrame:
        ranked = grouped_rank(
            s,
            ["event_type"],
            "late_us",
            [F.col("late_us"), F.col("event_id")],
            out_col="_rk",
            count_col="_gn",
        )
        pick = lambda q: F.max(  # noqa: E731 — value at the exact rank
            F.when(
                F.col("_rk") == F.floor((F.col("_gn") - 1) * F.lit(q)),
                F.col("late_us"),
            )
        )
        return ranked.groupBy("event_type").agg(
            F.max("_gn").cast("bigint").alias("n_late"),
            pick(0.5).alias("p50_lateness_us"),
            pick(0.99).alias("p99_lateness_us"),
            F.max("late_us").alias("max_lateness_us"),
        )

    return ranked_result(late, build)


# ---- round 7: session journey (path) mining --------------------------------

PATH_GAP_MIN = 30  # session inactivity gap, minutes
PATH_PREFIX = 4  # events per session kept in the path
PATH_TOP = 25  # report size


@register(
    "events_top_paths",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL THEN 1
                    WHEN ts - lag(ts) OVER w
                         > INTERVAL {PATH_GAP_MIN} MINUTE THEN 1
                    ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
        FROM ordered
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY user_id, session_no
                                     ORDER BY ts, event_id) AS rn
        FROM sess
    ),
    paths AS (
        SELECT user_id, session_no,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM ranked WHERE rn <= {PATH_PREFIX}
        GROUP BY user_id, session_no
    )
    SELECT path, COUNT(*) AS n_sessions, COUNT(DISTINCT user_id) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT {PATH_TOP}
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session journey mining: the top user paths, where a path is the
    '>'-joined sequence of the first PATH_PREFIX event types of a session
    (30-minute inactivity gap, gaps-and-islands sessionization shared with
    events_session_window). The clickstream analysis every product funnel
    audit starts from, and the sequence-mining counterpart of
    events_next_event_training_pairs (which emits pairwise transitions).

    Scale shape: sessionization is ONE shuffle on user_id and EVERY window
    function rides that one sort — the within-session rank is derived from
    the same ordered pass (rn_sess = rn_user - running_max(is_new *
    rn_user) + 1) instead of a second (user_id, session_no) partitioning,
    which would re-shuffle and re-sort the full event stream. The rank
    filter caps collect_list at PATH_PREFIX elements per session BEFORE
    the session groupBy, so no unbounded per-session buffering exists
    anywhere (a pathological always-active user can make a session
    arbitrarily long — the cap is what survives that at 100 TB). The
    path-frequency aggregate is partial-agg'd map-side; the final top-25
    is TakeOrderedAndProject, no global sort materialization."""
    e = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lag_ts = F.lag("ts").over(w)
    gap_us = epoch_us("ts") - epoch_us(lag_ts)
    is_new = (
        F.when(lag_ts.isNull(), 1)
        .when(gap_us > F.lit(PATH_GAP_MIN * 60 * 1_000_000), 1)
        .otherwise(0)
    )
    sess = (
        e.withColumn("is_new", is_new)
        .withColumn("rn_user", F.row_number().over(w))
        .withColumn("session_no", F.sum("is_new").over(wcum))
        # rank within session, derived from the SAME sorted pass: the
        # session's first row has is_new=1, so its rn_user is the running
        # max of is_new*rn_user for every row of the session
        .withColumn(
            "start_rn",
            F.max(F.when(F.col("is_new") == 1, F.col("rn_user"))).over(wcum),
        )
    )
    head = sess.filter(
        F.col("rn_user") - F.col("start_rn") < PATH_PREFIX
    )
    paths = head.groupBy("user_id", "session_no").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count("*").alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(PATH_TOP)
    )


@register(
    "anomaly_cusum_daily_revenue",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(18,2)) AS rev
        FROM orders GROUP BY d
    ),
    cents AS (SELECT d, rev, CAST(rev * 100 AS BIGINT) AS rc FROM daily),
    tgt AS (
        SELECT CAST(SUM(rc) AS BIGINT) // COUNT(*) AS target,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM cents
    ),
    dev AS (
        SELECT c.d, c.rev, c.rc - t.target AS dv FROM cents c, tgt t
    ),
    thr AS (
        SELECT 3 * (CAST(SUM(ABS(dv)) AS BIGINT) // COUNT(*)) AS h FROM dev
    ),
    walk AS (
        SELECT d, rev, dv,
               CAST(SUM(dv) OVER w AS BIGINT) AS p
        FROM dev
        WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ),
    cusum AS (
        SELECT d, rev,
               p - LEAST(0, MIN(p) OVER w) AS s_pos,
               GREATEST(0, MAX(p) OVER w) - p AS s_neg
        FROM walk
        WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    )
    SELECT c.d, CAST(c.rev AS DOUBLE) AS rev,
           CAST(c.s_pos AS BIGINT) AS s_pos_cents,
           CAST(c.s_neg AS BIGINT) AS s_neg_cents,
           (c.s_pos > t.h OR c.s_neg > t.h) AS alarm
    FROM cusum c, thr t
    """,
)
def anomaly_cusum_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily revenue — the sequential
    drift detector the rolling z-score misses (z flags single outlier
    days; CUSUM accumulates small sustained shifts until they cross h).
    The textbook recursion S_t = max(0, S_{t-1} + dev_t) is NOT expressed
    iteratively: the positive-part recursion has the closed form
    S_t = P_t - min(0, min_{k<=t} P_k) over the deviation prefix sums
    (the 0 term is the virtual empty prefix — S starts at zero), so both
    sides (upward and downward shifts) are two plain running windows —
    no recursion, no driver loop.

    Determinism discipline: revenue in exact integer cents, target = the
    integer mean, threshold h = 3x the integer mean absolute deviation —
    every compared quantity is BIGINT, so alarm booleans are bit-identical
    across engines and partitionings. The fact table collapses to the
    daily series first; the unpartitioned running windows scan |days|
    rows (the ewma_daily_revenue pattern — benign by construction)."""
    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("rev")
    )
    cents = daily.select(
        "d", "rev", (F.col("rev") * 100).cast("bigint").alias("rc")
    )
    tgt = cents.agg(
        F.expr("CAST(sum(rc) AS BIGINT) div count(*)").alias("target")
    )
    dev = cents.crossJoin(F.broadcast(tgt)).select(
        "d", "rev", (F.col("rc") - F.col("target")).alias("dv")
    )
    thr = dev.agg(
        F.expr("3 * (CAST(sum(abs(dv)) AS BIGINT) div count(*))").alias("h")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    walk = dev.select(
        "d", "rev", F.sum("dv").over(w).cast("bigint").alias("p")
    )
    cusum = walk.select(
        "d",
        "rev",
        (F.col("p") - F.least(F.lit(0), F.min("p").over(w))).alias("s_pos"),
        (F.greatest(F.lit(0), F.max("p").over(w)) - F.col("p")).alias("s_neg"),
    )
    return cusum.crossJoin(F.broadcast(thr)).select(
        "d",
        F.col("rev").cast("double").alias("rev"),
        F.col("s_pos").cast("bigint").alias("s_pos_cents"),
        F.col("s_neg").cast("bigint").alias("s_neg_cents"),
        ((F.col("s_pos") > F.col("h")) | (F.col("s_neg") > F.col("h"))).alias(
            "alarm"
        ),
    )


@register(
    "seasonality_dow_revenue",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(18,2)) AS rev
        FROM orders GROUP BY d
    ),
    cents AS (
        SELECT (d - DATE '1970-01-01') % 7 AS dow_idx,
               CAST(rev * 100 AS BIGINT) AS rc
        FROM daily
    ),
    per_dow AS (
        SELECT dow_idx,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(rc) AS BIGINT) // COUNT(*) AS mean_cents
        FROM cents GROUP BY dow_idx
    ),
    overall AS (
        SELECT CAST(SUM(rc) AS BIGINT) // COUNT(*) AS omean FROM cents
    )
    SELECT p.dow_idx, p.n_days,
           CAST(p.mean_cents AS DOUBLE) / 100.0 AS mean_rev,
           p.mean_cents * 1000000 // o.omean AS seasonal_index_micro
    FROM per_dow p, overall o
    """,
)
def seasonality_dow_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal decomposition of daily revenue: per-weekday
    mean vs the overall daily mean as an integer micro-unit seasonal index
    — the multiplicative-seasonality profile a forecaster divides out
    before trend fitting, and the capacity-planning shape ops teams read
    directly.

    Portability trap pinned here: Spark's dayofweek() is 1=Sunday..7 while
    DuckDB's is 0=Sunday..6 — so the weekday comes from pure date
    arithmetic instead (days-since-epoch mod 7, 0 = Thursday), identical
    in both engines by construction. All means are integer cents via div;
    the fact table collapses to the daily series before any weekday math,
    so the whole decomposition runs over |days| rows."""
    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("rev")
    )
    cents = daily.select(
        (F.datediff(F.col("d"), F.lit("1970-01-01")) % 7).alias("dow_idx"),
        (F.col("rev") * 100).cast("bigint").alias("rc"),
    )
    per_dow = cents.groupBy("dow_idx").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.expr("CAST(sum(rc) AS BIGINT) div count(*)").alias("mean_cents"),
    )
    overall = cents.agg(
        F.expr("CAST(sum(rc) AS BIGINT) div count(*)").alias("omean")
    )
    return per_dow.crossJoin(F.broadcast(overall)).select(
        "dow_idx",
        "n_days",
        (F.col("mean_cents").cast("double") / 100.0).alias("mean_rev"),
        F.expr("mean_cents * 1000000 div omean").alias("seasonal_index_micro"),
    )


CEP_PATTERNS = (
    ("browse_to_buy", "vc*p"),
    ("error_burst", "ee+"),
    ("signup_to_purchase", "s[cve]*p"),
)


@register(
    "events_pattern_regex_cep",
    oracle=f"""
    WITH j AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS journey
        FROM events GROUP BY user_id
    ),
    pats(pattern_name, pat) AS (VALUES
        {", ".join(f"('{n}', '{p}')" for n, p in CEP_PATTERNS)}),
    m AS (
        SELECT p.pattern_name,
               CAST(len(regexp_extract_all(j.journey, p.pat)) AS BIGINT)
                   AS n_matches
        FROM j CROSS JOIN pats p
    )
    SELECT pattern_name,
           CAST(COUNT(*) FILTER (WHERE n_matches > 0) AS BIGINT) AS n_users,
           CAST(SUM(n_matches) AS BIGINT) AS total_matches,
           CAST(MAX(n_matches) AS BIGINT) AS max_per_user
    FROM m GROUP BY pattern_name
    """,
)
def events_pattern_regex_cep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern detection via the journey-string
    trick (MATCH_RECOGNIZE-lite): each user's event history collapses to
    an ordered string of type initials, and sequence patterns become plain
    regexes over it — 'vc*p' (view, any clicks, purchase), 'ee+' (error
    bursts), 's[cve]*p' (signup eventually converting). Per pattern: users
    matched, total non-overlapping matches, max per user.

    This is the batch analog of streaming CEP engines' NFA matching; the
    string form costs one per-user shuffle + an array-local sort of each
    user's OWN events (bounded by per-user activity, never a global sort)
    and turns the sequential scan into a codegen regex — no UDF, no state
    machine in Python. Patterns are kept to portable syntax (literal
    classes + * and + quantifiers) with left-to-right non-overlapping
    semantics identical in both engines' regex libraries; ordering ties
    break on event_id so journeys are bit-identical."""
    e = load(spark, sf_dir, "events")
    j = e.groupBy("user_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(ts, event_id, substring(event_type, 1, 1) AS ini))), "
            "x -> x.ini), '')"
        ).alias("journey")
    )
    pats = spark.createDataFrame(
        list(CEP_PATTERNS), "pattern_name string, pat string"
    )
    m = j.crossJoin(F.broadcast(pats)).select(
        "pattern_name",
        F.expr("regexp_count(journey, pat)").cast("bigint").alias("n_matches"),
    )
    return m.groupBy("pattern_name").agg(
        F.count(F.when(F.col("n_matches") > 0, 1)).cast("bigint").alias("n_users"),
        F.sum("n_matches").cast("bigint").alias("total_matches"),
        F.max("n_matches").cast("bigint").alias("max_per_user"),
    )


KM_HOUR_US = 3600 * 1_000_000
KM_HORIZON_H = 72  # administrative censoring horizon (hours)


@register(
    "events_survival_km",
    oracle=f"""
    WITH u AS (
        SELECT user_id, MIN(ts) AS fts FROM events GROUP BY user_id
    ),
    p AS (
        SELECT user_id, MIN(ts) AS fp FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
    ),
    lab AS (
        SELECT u.user_id,
               CASE WHEN p.fp IS NOT NULL
                     AND date_diff('microsecond', u.fts, p.fp)
                         // {KM_HOUR_US} < {KM_HORIZON_H}
                    THEN date_diff('microsecond', u.fts, p.fp) // {KM_HOUR_US}
                    ELSE {KM_HORIZON_H} END AS tw,
               (p.fp IS NOT NULL
                AND date_diff('microsecond', u.fts, p.fp)
                    // {KM_HOUR_US} < {KM_HORIZON_H}) AS converted
        FROM u LEFT JOIN p USING (user_id)
    ),
    wk AS (
        SELECT tw,
               CAST(COUNT(*) FILTER (WHERE converted) AS BIGINT) AS d,
               CAST(COUNT(*) FILTER (WHERE NOT converted) AS BIGINT) AS c
        FROM lab GROUP BY tw
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lab),
    risk AS (
        SELECT tw, d, c,
               CAST(t.n - COALESCE(SUM(d + c) OVER (ORDER BY tw
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS n_at_risk
        FROM wk, tot t
    )
    SELECT r1.tw AS hour, r1.n_at_risk, r1.d AS n_events,
           r1.c AS n_censored,
           ROUND((SELECT list_reduce(list_prepend(1.0::DOUBLE,
                      list((r2.n_at_risk - r2.d)::DOUBLE / r2.n_at_risk
                           ORDER BY r2.tw)),
                      (x, y) -> x * y)
                  FROM risk r2 WHERE r2.tw <= r1.tw AND r2.d > 0), 6)
               AS survival
    FROM risk r1
    """,
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-conversion curve — the censoring-aware version
    of 'what fraction has purchased within T hours' (a naive conversion
    CDF is biased whenever observation windows differ; KM handles the
    not-yet-converted as censored): T = hours from a user's first event to
    their first purchase, administratively censored at the
    {KM_HORIZON_H}-hour horizon. S(t) = prod over event-hours u <= t of
    (1 - d(u)/n(u)) — the survival probability of remaining un-converted.

    Engine-exactness for a PRODUCT estimator without logs: d, c, n_at_risk
    are integers (microsecond arithmetic), each factor is one double
    division, and the product folds over ASCENDING event hours in both
    engines — the identical IEEE multiply sequence, bit-for-bit equal
    (exp(sum(ln)) would not be). The user reduction is map-side
    combinable; the per-hour table is <= {KM_HORIZON_H}+1 rows, so the
    sequential fold runs driver-side over a bounded frame (the pagerank
    bounded-collect discipline); everything user-sized stays distributed."""
    e = load(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(F.min("ts").alias("fts"))
    pch = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp"))
    )
    delay_h = ((epoch_us("fp") - epoch_us("fts")) / KM_HOUR_US).cast("long")
    converted = F.col("fp").isNotNull() & (delay_h < KM_HORIZON_H)
    lab = u.join(pch, "user_id", "left").select(
        "user_id",
        F.when(converted, delay_h).otherwise(F.lit(KM_HORIZON_H)).alias("tw"),
        converted.alias("converted"),
    )
    wk = lab.groupBy("tw").agg(
        F.count(F.when(F.col("converted"), 1)).cast("bigint").alias("d"),
        F.count(F.when(~F.col("converted"), 1)).cast("bigint").alias("c"),
    )
    tot = lab.agg(F.count("*").cast("bigint").alias("n"))
    w = Window.orderBy("tw").rowsBetween(Window.unboundedPreceding, -1)
    risk = wk.crossJoin(F.broadcast(tot)).select(
        "tw",
        "d",
        "c",
        (
            F.col("n")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w), F.lit(0))
        )
        .cast("bigint")
        .alias("n_at_risk"),
    )
    rows = sorted(risk.collect(), key=lambda r: r.tw)  # bounded: <= 73 rows
    s = 1.0
    out = []
    from decimal import ROUND_HALF_UP, Decimal

    for r in rows:
        if r.d > 0:
            s *= (r.n_at_risk - r.d) / r.n_at_risk
        # DuckDB ROUND(x, 6) is std::round(x * 1e6) / 1e6 — half away
        # from zero evaluated EXACTLY on the product double. The earlier
        # floor(v + 0.5) idiom could disagree by one final digit when v
        # sits within one ulp below x.5 and the +0.5 addition rounds up
        # across the boundary (ADVICE r10); Decimal(v) converts the
        # binary double exactly, so quantize(HALF_UP) == std::round(v)
        # for v >= 0 (s is always >= 0).
        v = Decimal(s * 1e6).to_integral_value(rounding=ROUND_HALF_UP)
        out.append((r.tw, r.n_at_risk, r.d, r.c, float(v) / 1e6))
    return spark.createDataFrame(
        out,
        "hour bigint, n_at_risk bigint, n_events bigint, "
        "n_censored bigint, survival double",
    )


@register(
    "events_poisson_rate_anomaly",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               date_diff('microsecond',
                         TIMESTAMP '1970-01-01 00:00:00', ts)
                   // 3600000000 AS hour_idx,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, hour_idx
    ),
    tot AS (
        SELECT event_type,
               CAST(SUM(n) AS BIGINT) AS t,
               CAST(COUNT(*) AS BIGINT) AS h
        FROM hourly GROUP BY event_type
    )
    SELECT hy.event_type, hy.hour_idx, hy.n,
           t.t * 1000000 // t.h AS mean_micro
    FROM hourly hy JOIN tot t USING (event_type)
    WHERE hy.n * t.h > t.t
      AND (hy.n * t.h - t.t) * (hy.n * t.h - t.t) > 9 * t.t * t.h
    """,
)
def events_poisson_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson rate anomaly detection on hourly event counts: under a
    homogeneous Poisson process the hourly count has mean = variance =
    lambda, so hours with n > lambda + 3*sqrt(lambda) are 3-sigma bursts
    — the count-process traffic-spike monitor (z-scores assume Gaussian
    residuals; for counts the Poisson bound is the right null).

    The 3-sigma test is done WITHOUT sqrt or doubles: with lambda = T/H
    (total / observed hours, a rational), n > lambda + 3*sqrt(lambda)
    cross-multiplies to (n*H - T)^2 > 9*T*H given n*H > T — every compared
    quantity a bounded int64 product. Shape: one (type, hour) map-side-
    combinable count, a per-type 1-row total joined back (broadcast-
    sized), and a scan-side filter; output is only the flagged hours."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        (epoch_us("ts") / F.lit(3600_000_000)).cast("long").alias("hour_idx"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    tot = hourly.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("t"),
        F.count("*").cast("bigint").alias("h"),
    )
    j = hourly.join(F.broadcast(tot), "event_type")
    lhs = F.col("n") * F.col("h") - F.col("t")
    return (
        j.filter((F.col("n") * F.col("h") > F.col("t")) & (lhs * lhs > 9 * F.col("t") * F.col("h")))
        .select(
            "event_type",
            "hour_idx",
            "n",
            F.expr("t * 1000000 div h").alias("mean_micro"),
        )
    )


BOT_TOP = 20


@register(
    "events_bot_regularity_score",
    oracle=f"""
    WITH seq AS (
        SELECT user_id,
               date_diff('microsecond',
                         lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id),
                         ts) // 60000000 AS gap_min
        FROM events
    ),
    per AS (
        SELECT user_id,
               CAST(COUNT(gap_min) AS BIGINT) AS k,
               CAST(SUM(gap_min) AS BIGINT) AS sg,
               CAST(SUM(gap_min * gap_min) AS BIGINT) AS sg2
        FROM seq GROUP BY user_id HAVING COUNT(gap_min) >= 2
    )
    SELECT user_id, k + 1 AS n_events, sg AS span_min,
           CASE WHEN sg > 0
                THEN (k * sg2 - sg * sg) * 1000000 // (sg * sg)
                ELSE 0 END AS cv2_micro,
           (sg > 0 AND (k * sg2 - sg * sg) * 2 < sg * sg) AS regular_flag
    FROM per
    ORDER BY n_events DESC, user_id LIMIT {BOT_TOP}
    """,
)
def events_bot_regularity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/automation detection via inter-arrival regularity: humans are
    bursty (squared coefficient of variation of gaps CV^2 ~ 1 for a
    Poisson process, higher for sessions), schedulers and scripts are
    metronomic (CV^2 << 1). Per user: CV^2 of inter-event gaps as the
    EXACT integer ratio (k*sum(g^2) - sum(g)^2) * 1e6 div sum(g)^2 —
    algebraically var/mean^2 with no doubles and no division until the
    final micro-unit ratio; gaps are floored to whole minutes so the
    worst-case product stays ~1.9e18 < 2^63 (sized like the JL audit).
    The regular_flag marks CV^2 < 0.5, the classic automation threshold.

    Shape: one (user-keyed) lag window — the same shuffle every
    sessionization query pays — then a map-side-combinable moment
    aggregate; the report is the top-{BOT_TOP} most active users
    (TakeOrdered, ties on user_id)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        ((epoch_us("ts") - epoch_us(F.lag("ts").over(w))) / F.lit(60_000_000))
        .cast("long")
        .alias("gap_min"),
    )
    per = (
        seq.groupBy("user_id")
        .agg(
            F.count("gap_min").cast("bigint").alias("k"),
            F.sum("gap_min").cast("bigint").alias("sg"),
            F.sum(F.col("gap_min") * F.col("gap_min"))
            .cast("bigint")
            .alias("sg2"),
        )
        .filter(F.col("k") >= 2)
    )
    out = per.select(
        "user_id",
        (F.col("k") + 1).alias("n_events"),
        F.col("sg").alias("span_min"),
        F.when(
            F.col("sg") > 0,
            F.expr("(k * sg2 - sg * sg) * 1000000 div (sg * sg)"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("cv2_micro"),
        (
            (F.col("sg") > 0)
            & ((F.col("k") * F.col("sg2") - F.col("sg") * F.col("sg")) * 2 < F.col("sg") * F.col("sg"))
        ).alias("regular_flag"),
    )
    return out.orderBy(F.desc("n_events"), "user_id").limit(BOT_TOP)
