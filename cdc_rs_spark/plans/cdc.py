"""CDC query inventory — the reference's dataflow operators as oracle-checked
queries over the fixtures (SURVEY §2.1 #1-#9).

Each query projects scalar columns (not the map envelope) so the DuckDB
value-hash comparison is well-defined; the envelope mechanics themselves are
additionally covered by golden unit tests in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_rs_spark.envelope import snapshot_changes
from cdc_rs_spark.functions.transforms import (
    bigquery_fields,
    change_type,
    op_code,
    topic_column,
)
from cdc_rs_spark.operators.compaction import latest_per_key
from cdc_rs_spark.operators.filter import regex_table_filter
from cdc_rs_spark.operators.merge import corrected_backfill
from cdc_rs_spark.registry import register
from cdc_rs_spark.session import load
from cdc_rs_spark.sources.synthetic import ORACLE_LIVE_CHANGES, live_orders_changes

# DuckDB-side reproduction of the reference timestamp stringification
# (encode.py): midnight+0us -> date only; 0us -> seconds; else 6-digit micros.
_ORACLE_TS_ENCODE = """
    CASE WHEN {c} = date_trunc('day', {c}) THEN strftime({c}, '%Y-%m-%d')
         WHEN {c} = date_trunc('second', {c}) THEN strftime({c}, '%Y-%m-%d %H:%M:%S')
         ELSE strftime({c}, '%Y-%m-%d %H:%M:%S.%f') END
"""


@register(
    "cdc_backfill_bigquery",
    oracle=f"""
    SELECT o_orderkey AS okey,
           o_custkey AS custkey,
           o_orderstatus AS status,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS total,
           {_ORACLE_TS_ENCODE.format(c="o_orderdate")} AS odate,
           o_orderpriority AS priority,
           'UPSERT' AS _CHANGE_TYPE,
           'testdb' AS tenant
    FROM orders
    """,
)
def cdc_backfill_bigquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §7 minimum slice: snapshot `orders` -> Backfill changes ->
    BigQuery-CDC envelope (UPSERT + tenant injection, test.rhai:25-36) ->
    scalar projection. Exercises the backfill source, envelope encoding, and
    the BigQuery transform end-to-end."""
    changes = snapshot_changes(load(spark, sf_dir, "orders"), "testdb", "orders", "o_orderkey")
    fields = bigquery_fields(changes)
    out = changes.select(fields.alias("f"))
    return out.select(
        F.col("f")["o_orderkey"].cast("bigint").alias("okey"),
        F.col("f")["o_custkey"].cast("bigint").alias("custkey"),
        F.col("f")["o_orderstatus"].alias("status"),
        F.col("f")["o_totalprice"].cast("double").cast("decimal(18,2)").cast("string").alias("total"),
        F.col("f")["o_orderdate"].alias("odate"),
        F.col("f")["o_orderpriority"].alias("priority"),
        F.col("f")["_CHANGE_TYPE"].alias("_CHANGE_TYPE"),
        F.col("f")["tenant"].alias("tenant"),
    )


@register(
    "cdc_merge_live_wins",
    oracle=f"""
    WITH live AS ({ORACLE_LIVE_CHANGES}),
    backfill AS (
        SELECT 'Backfill' AS op, o_orderkey AS okey, 1::BIGINT AS ts,
               o_totalprice AS total
        FROM orders
    ),
    all_changes AS (
        SELECT op, okey, ts, total, 0 AS prio FROM backfill
        UNION ALL
        SELECT op, okey, ts, total, 1 AS prio FROM live
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY okey
            ORDER BY prio DESC, ts DESC,
                     CASE op WHEN 'Update' THEN 3 WHEN 'Insert' THEN 2
                             WHEN 'Delete' THEN 1 ELSE 0 END DESC
        ) AS rn
        FROM all_changes
    )
    SELECT op, okey, ts, total FROM ranked WHERE rn = 1
    """,
)
def cdc_merge_live_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one genuinely stateful reference operator (src/main.rs:71-121):
    per-key 'live change supersedes backfill row' arbitration over the union
    of the snapshot and the synthetic live feed."""
    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    merged = corrected_backfill(backfill, live)
    img = F.coalesce(F.col("after"), F.col("before"))
    return merged.select(
        F.col("op"),
        img[F.col("pkey")].cast("bigint").alias("okey"),
        F.col("ts"),
        F.col("after")["o_totalprice"].cast("double").alias("total"),
    )


@register(
    "cdc_compact_latest",
    oracle=f"""
    WITH live AS ({ORACLE_LIVE_CHANGES}),
    backfill AS (
        SELECT 'Backfill' AS op, o_orderkey AS okey, 1::BIGINT AS ts,
               o_totalprice AS total
        FROM orders
    ),
    all_changes AS (
        SELECT op, okey, ts, total FROM backfill
        UNION ALL SELECT op, okey, ts, total FROM live
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY okey ORDER BY ts DESC,
                CASE op WHEN 'Update' THEN 3 WHEN 'Insert' THEN 2
                        WHEN 'Delete' THEN 1 ELSE 0 END DESC
        ) AS rn
        FROM all_changes
    )
    SELECT op, okey, total FROM ranked WHERE rn = 1 AND op <> 'Delete'
    """,
)
def cdc_compact_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key compaction with delete tombstoning — the
    materialized-state collapse the reference's UPSERT envelope implies
    (test.rhai:27-33)."""
    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    compacted = latest_per_key(backfill.unionByName(live), drop_deletes=True)
    img = F.coalesce(F.col("after"), F.col("before"))
    return compacted.select(
        F.col("op"),
        img[F.col("pkey")].cast("bigint").alias("okey"),
        F.col("after")["o_totalprice"].cast("double").alias("total"),
    )


@register(
    "cdc_regex_filter",
    oracle="""
    WITH changes AS (
        SELECT 'testdb' AS db, 'orders' AS tbl, COUNT(*) AS n FROM orders
        UNION ALL SELECT 'testdb', 'customer', COUNT(*) FROM customer
        UNION ALL SELECT 'otherdb', 'nation', COUNT(*) FROM nation
    )
    SELECT db, tbl AS "table", n
    FROM changes
    WHERE regexp_matches(db || '.' || tbl, '^testdb\\.(orders|customer)$')
    """,
)
def cdc_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex table gate (src/main.rs:220,260-262) over a multi-table change
    stream: testdb.* tables pass, otherdb.* is dropped pre-decode."""
    parts = []
    for db, table in [("testdb", "orders"), ("testdb", "customer"), ("otherdb", "nation")]:
        df = load(spark, sf_dir, table)
        parts.append(snapshot_changes(df, db, table, df.columns[0]))
    changes = parts[0]
    for p in parts[1:]:
        changes = changes.unionByName(p)
    filtered = regex_table_filter(changes, r"^testdb\.(orders|customer)$")
    return filtered.groupBy("db", "table").agg(F.count("*").alias("n"))


@register(
    "cdc_topic_routing",
    oracle="""
    WITH changes AS (
        SELECT 'testdb' AS db, 'orders' AS tbl, COUNT(*) AS n FROM orders
        UNION ALL SELECT 'testdb', 'lineitem', COUNT(*) FROM lineitem
        UNION ALL SELECT 'testdb', 'customer', COUNT(*) FROM customer
    )
    SELECT 'projects/p/topics/all_pims.' || tbl AS topic, n
    FROM changes
    """,
)
def cdc_topic_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic topic routing (src/main.rs:424-435; template per test.rhai:
    46-48): per-row computed topic column, counted per topic."""
    parts = []
    for table in ["orders", "lineitem", "customer"]:
        df = load(spark, sf_dir, table)
        parts.append(snapshot_changes(df, "testdb", table, df.columns[0]))
    changes = parts[0]
    for p in parts[1:]:
        changes = changes.unionByName(p)
    routed = changes.withColumn(
        "topic", topic_column("projects/p/topics/all_pims.${table}")
    )
    return routed.groupBy("topic").agg(F.count("*").alias("n"))


@register(
    "cdc_envelope_opcodes",
    oracle=f"""
    WITH live AS ({ORACLE_LIVE_CHANGES}),
    all_changes AS (
        SELECT 'Backfill' AS op FROM orders
        UNION ALL SELECT op FROM live
    )
    SELECT op,
           CASE op WHEN 'Backfill' THEN 'c' WHEN 'Insert' THEN 'c'
                   WHEN 'Update' THEN 'u' WHEN 'Delete' THEN 'd' ELSE op END AS op_code,
           CASE op WHEN 'Delete' THEN 'DELETE' ELSE 'UPSERT' END AS change_type,
           COUNT(*) AS n
    FROM all_changes
    GROUP BY 1, 2, 3
    """,
)
def cdc_envelope_opcodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op-code semantics table (SURVEY §2.3): Debezium op letter + BigQuery
    _CHANGE_TYPE for every op kind flowing through the merged stream."""
    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    merged = backfill.unionByName(live)
    return (
        merged.select(
            F.col("op"),
            op_code(F.col("op")).alias("op_code"),
            change_type(F.col("op")).alias("change_type"),
        )
        .groupBy("op", "op_code", "change_type")
        .agg(F.count("*").alias("n"))
    )


@register(
    "cdc_change_rate_stats",
    oracle=f"""
    WITH live AS ({ORACLE_LIVE_CHANGES}),
    backfill AS (
        SELECT 'Backfill' AS op, o_orderkey AS okey, 1::BIGINT AS ts,
               o_totalprice AS total
        FROM orders
    ),
    all_changes AS (
        SELECT op, ts FROM backfill UNION ALL SELECT op, ts FROM live
    )
    SELECT op, ts, COUNT(*) AS n,
           ROUND(COUNT(*)::DOUBLE
                 / (SELECT COUNT(*) FROM all_changes), 6) AS frac
    FROM all_changes GROUP BY op, ts
    """,
)
def cdc_change_rate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(op, commit-ts) change-rate stats over the merged CDC stream
    (SURVEY §2.2 aggregations row, EXTENSION: 'per-table change-rate stats
    over the CDC stream') — the operational dashboard the reference has no
    way to compute. The global total is a 1-row broadcast, not a collect."""
    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    changes = backfill.unionByName(live).select("op", "ts")
    counts = changes.groupBy("op", "ts").agg(F.count("*").alias("n"))
    total = changes.agg(F.count("*").alias("total"))
    return (
        counts.join(F.broadcast(total))
        .select(
            "op", "ts", "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias("frac"),
        )
    )


@register(
    "cdc_incremental_agg_maintenance",
    oracle="""
    WITH final_state AS (
        -- what the base table looks like after the live changes land:
        -- %10=7 deleted, %10=3 repriced (+1000), %10=1 cloned as a new key
        SELECT o_orderpriority AS grp,
               o_totalprice
                 + CASE WHEN o_orderkey % 10 = 3 THEN 1000.0 ELSE 0 END AS v
        FROM orders WHERE o_orderkey % 10 <> 7
        UNION ALL
        SELECT o_orderpriority, o_totalprice
        FROM orders WHERE o_orderkey % 10 = 1
    )
    SELECT grp, COUNT(*) AS n_rows,
           CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM final_state GROUP BY grp
    """,
)
def cdc_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance (operators/incremental.py):
    COUNT/SUM(o_totalprice) per priority maintained purely from change
    deltas — backfill asserts, deletes retract, updates retract+assert. The
    oracle recomputes the aggregate from the post-change table; the delta
    path must match it exactly (decimal sums), proving O(changes) upkeep is
    equivalent to an O(table) rescan."""
    from cdc_rs_spark.operators.incremental import incremental_agg

    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    changes = backfill.unionByName(live)
    out = incremental_agg(
        changes,
        group_of=lambda img: img["o_orderpriority"],
        value_of=lambda img: img["o_totalprice"].cast("double").cast("decimal(18,2)"),
    )
    return out.select(
        F.col("grp"),
        "n_rows",
        # DOUBLE, not DECIMAL(38,2): the driver hash canonicalizes pandas
        # reprs, and DuckDB wide decimals surface differently from Spark's —
        # the exact decimal sum is still computed, only the emitted type is
        # hash-stable (decimal->double is correctly-rounded on both engines).
        F.col("total").cast("decimal(38,2)").cast("double").alias("total"),
    )


@register(
    "cdc_minmax_after_changes",
    oracle="""
    WITH final_state AS (
        SELECT o_orderpriority AS grp,
               o_totalprice
                 + CASE WHEN o_orderkey % 10 = 3 THEN 1000.0 ELSE 0 END AS v
        FROM orders WHERE o_orderkey % 10 <> 7
        UNION ALL
        SELECT o_orderpriority, o_totalprice
        FROM orders WHERE o_orderkey % 10 = 1
    )
    SELECT grp, MIN(v) AS min_price, MAX(v) AS max_price
    FROM final_state GROUP BY grp
    """,
)
def cdc_minmax_after_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-additive aggregates (MIN/MAX) after CDC: deltas can't retract an
    extremum, so the correct maintenance path is compaction-then-aggregate —
    latest_per_key collapses the change log to current rows, then a plain
    group agg. Complements cdc_incremental_agg_maintenance (which covers the
    additive COUNT/SUM fast path); together they are the two standard IVM
    regimes."""
    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    compacted = latest_per_key(backfill.unionByName(live), drop_deletes=True)
    cur = compacted.select(
        F.col("after")["o_orderpriority"].alias("grp"),
        F.col("after")["o_totalprice"].cast("double").alias("v"),
    )
    return cur.groupBy("grp").agg(
        F.min("v").alias("min_price"), F.max("v").alias("max_price")
    )


@register(
    "envelope_field_histogram",
    oracle=f"""
    WITH live AS ({ORACLE_LIVE_CHANGES}),
    n_after AS (
        -- rows carrying an after image: backfill + updates + inserts
        SELECT (SELECT COUNT(*) FROM orders)
             + (SELECT COUNT(*) FROM orders WHERE o_orderkey % 10 = 3)
             + (SELECT COUNT(*) FROM orders WHERE o_orderkey % 10 = 1) AS n
    )
    SELECT col, n.n AS n_present
    FROM (VALUES ('o_orderkey'), ('o_custkey'), ('o_orderstatus'),
                 ('o_totalprice'), ('o_orderdate'), ('o_orderpriority')) t(col)
    CROSS JOIN n_after n
    """,
)
def envelope_field_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function surface over the envelope: explode map_keys(after) and
    count per field — the schema-drift observability query (a new upstream
    column shows up here first, long before any consumer declares it).
    Every field appears in every after image for this feed, so the oracle is
    the after-image count per column."""
    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    changes = backfill.unionByName(live)
    return (
        changes.filter(F.col("after").isNotNull())
        .select(F.explode(F.map_keys(F.col("after"))).alias("col"))
        .groupBy("col")
        .agg(F.count("*").alias("n_present"))
    )


@register(
    "cdc_typed_projection",
    oracle="""
    SELECT o_orderkey AS okey,
           o_custkey AS custkey,
           CAST(o_totalprice AS DOUBLE) AS total,
           strftime(o_orderdate, '%Y-%m-%d') AS odate
    FROM orders
    WHERE o_totalprice > 100000
    """,
)
def cdc_typed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declared-schema decode path (envelope.typed_changes — SCALE.md §9
    names it the performance path because map<string,string> images defeat
    pruning): Backfill envelope -> typed before/after structs via per-field
    cast (no JSON round-trip, whole-stage codegen) -> typed predicate +
    projection. The filter applies to the DECODED decimal, proving
    predicates work on typed image fields, not just raw strings."""
    from cdc_rs_spark.envelope import typed_changes

    orders = load(spark, sf_dir, "orders")
    changes = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    typed = typed_changes(
        changes,
        [
            ("o_orderkey", "bigint"),
            ("o_custkey", "bigint"),
            ("o_totalprice", "decimal(18,2)"),
            ("o_orderdate", "string"),
        ],
    )
    a = F.col("after")
    return typed.filter(a["o_totalprice"] > 100000).select(
        a["o_orderkey"].alias("okey"),
        a["o_custkey"].alias("custkey"),
        a["o_totalprice"].cast("double").alias("total"),
        F.substring(a["o_orderdate"], 1, 10).alias("odate"),
    )


@register(
    "cdc_snapshot_diff",
    oracle="""
    WITH old AS (
        SELECT o_orderkey AS okey, o_totalprice AS total, o_orderstatus AS status
        FROM orders
    ),
    new AS (
        SELECT o_orderkey AS okey,
               CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice + 1000.0
                    ELSE o_totalprice END AS total,
               o_orderstatus AS status
        FROM orders WHERE o_orderkey % 10 <> 7
        UNION ALL
        SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 10 = 1
    )
    SELECT CASE WHEN o.okey IS NULL THEN 'Insert'
                WHEN n.okey IS NULL THEN 'Delete'
                ELSE 'Update' END AS op,
           COALESCE(o.okey, n.okey) AS okey,
           CAST(o.total AS DOUBLE) AS old_total,
           CAST(n.total AS DOUBLE) AS new_total
    FROM old o FULL OUTER JOIN new n ON o.okey = n.okey
    WHERE o.okey IS NULL OR n.okey IS NULL
       OR o.total IS DISTINCT FROM n.total
       OR o.status IS DISTINCT FROM n.status
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot differencing — the change-feed BOOTSTRAP the reference
    cannot do (it requires a live binlog; src/main.rs:202): given two
    periodic table dumps, derive the Insert/Update/Delete stream between
    them with one full-outer join on the primary key + column-level
    IS DISTINCT FROM comparison. The synthetic 'new' snapshot applies the
    same mutations as the live-change generator (price bump on %10=3,
    delete %10=7, insert %10=1). At 100 TB both snapshots shuffle once on
    the key (co-partitionable/bucketable across runs since the key is
    stable); comparing declared columns beats whole-row hashing because it
    needs no cross-engine-stable stringification and prunes to exactly the
    compared columns at the scan."""
    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    old = orders.select(
        k.alias("okey"),
        F.col("o_totalprice").alias("total"),
        F.col("o_orderstatus").alias("status"),
    )
    new = (
        orders.filter(k % 10 != 7)
        .select(
            k.alias("okey"),
            F.when(k % 10 == 3, F.col("o_totalprice") + 1000.0)
            .otherwise(F.col("o_totalprice"))
            .alias("total"),
            F.col("o_orderstatus").alias("status"),
        )
        .unionByName(
            orders.filter(k % 10 == 1).select(
                (k + 10_000_000).alias("okey"),
                F.col("o_totalprice").alias("total"),
                F.col("o_orderstatus").alias("status"),
            )
        )
    )
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col("o.okey") == F.col("n.okey"), "full_outer")
    changed = joined.filter(
        F.col("o.okey").isNull()
        | F.col("n.okey").isNull()
        | ~F.col("o.total").eqNullSafe(F.col("n.total"))
        | ~F.col("o.status").eqNullSafe(F.col("n.status"))
    )
    return changed.select(
        F.when(F.col("o.okey").isNull(), "Insert")
        .when(F.col("n.okey").isNull(), "Delete")
        .otherwise("Update")
        .alias("op"),
        F.coalesce(F.col("o.okey"), F.col("n.okey")).alias("okey"),
        F.col("o.total").cast("double").alias("old_total"),
        F.col("n.total").cast("double").alias("new_total"),
    )


@register(
    "cdc_join_view_maintenance",
    oracle="""
    WITH final_state AS (
        SELECT o_custkey,
               o_totalprice
                 + CASE WHEN o_orderkey % 10 = 3 THEN 1000.0 ELSE 0 END AS v
        FROM orders WHERE o_orderkey % 10 <> 7
        UNION ALL
        SELECT o_custkey, o_totalprice
        FROM orders WHERE o_orderkey % 10 = 1
    )
    SELECT n.n_name AS nation,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM final_state f
    JOIN customer c ON f.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def cdc_join_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of an ENRICHED materialized view — revenue
    per customer nation over orders JOIN customer JOIN nation — purely from
    the fact-side change stream (operators/incremental.py:
    incremental_join_agg). Each change's retract/assert delta is joined to
    the broadcast dimension before aggregation, so upkeep is O(changes) with
    one shuffle on the nation key; the oracle recomputes the view from the
    post-change base table and must match the delta-maintained state
    exactly (decimal sums). This is the classic deltaFact JOIN dim half of
    join-view IVM; the dim-side half is the same algebra with roles
    swapped."""
    from cdc_rs_spark.operators.incremental import incremental_join_agg

    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    changes = backfill.unionByName(live)
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dim = customer.join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"]).select(
        "c_custkey", F.col("n_name").alias("nation")
    )
    out = incremental_join_agg(
        changes,
        dim,
        key_of=lambda img: img["o_custkey"].cast("bigint"),
        dim_key="c_custkey",
        group_col="nation",
        value_of=lambda img: img["o_totalprice"].cast("double").cast("decimal(18,2)"),
    )
    return out.select(
        "nation",
        "n_rows",
        F.col("total").cast("decimal(38,2)").cast("double").alias("total"),
    )


@register(
    "cdc_audit_trail",
    oracle=f"""
    WITH live AS ({ORACLE_LIVE_CHANGES}),
    backfill AS (
        SELECT 'Backfill' AS op, o_orderkey AS okey, 1::BIGINT AS ts
        FROM orders
    ),
    all_changes AS (
        SELECT op, okey, ts FROM backfill
        UNION ALL
        SELECT op, okey, ts FROM live
    ),
    trails AS (
        SELECT okey, string_agg(op, '>' ORDER BY ts, op) AS lifecycle
        FROM all_changes GROUP BY okey
    )
    SELECT lifecycle, CAST(COUNT(*) AS BIGINT) AS n_keys
    FROM trails GROUP BY lifecycle
    """,
)
def cdc_audit_trail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC observability: per-key lifecycle pattern (the ordered op history,
    e.g. 'Backfill>Update') aggregated into a pattern histogram — the audit
    a pipeline runs to spot anomalous lifecycles (deletes without inserts,
    double-backfills) at a glance. Determinism: collect_list order is NOT
    defined after a shuffle, so the trail is built as sort_array over
    (ts, op) structs before joining — the same trick as the sorted
    array-agg queries; the oracle's string_agg carries the matching ORDER
    BY. One shuffle on key, then a histogram over |patterns| rows."""
    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    changes = backfill.unionByName(live)
    img = F.coalesce(F.col("after"), F.col("before"))
    keyed = changes.select(
        img[F.col("pkey")].cast("bigint").alias("okey"), "ts", "op"
    )
    trails = keyed.groupBy("okey").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(F.collect_list(F.struct("ts", "op"))),
                lambda s: s["op"],
            ),
        ).alias("lifecycle")
    )
    return trails.groupBy("lifecycle").agg(
        F.count("*").cast("bigint").alias("n_keys")
    )


# ---------------------------------------------------------------------------
# Rhai-subset script execution (round 3 — functions/rhai.py). The script text
# below is ORIGINAL but exercises exactly the language surface the
# reference's stock script needs (test.rhai:1-52: map field writes, #{}
# literals, switch with `_`, if/else as expression, backtick interpolation,
# fn calls), so a user of the reference could carry their transform script
# over. It compiles ONCE to Column expressions — no per-row VM, no Python.

RHAI_DEMO_SCRIPT = """
// flattened warehouse envelope: image choice + op tagging + tenant stamp
fn flat(db, table, op, before, after, ts) {
    let fields = if op == "Delete" { before } else { after };
    fields._CHANGE_TYPE = switch op {
        "Backfill" => "UPSERT",
        "Insert" => "UPSERT",
        "Update" => "UPSERT",
        "Delete" => "DELETE",
        _ => op,
    };
    fields.tenant = db;
    fields
}

fn transform(db, table, op, before, after, ts) {
    flat(db, table, op, before, after, ts)
}

// nested log-style envelope built from map literals
fn nested(db, table, op, before, after, ts) {
    #{
        payload: #{
            before: before,
            after: after,
            op: switch op {
                "Backfill" => "c",
                "Insert" => "c",
                "Update" => "u",
                "Delete" => "d",
                _ => op,
            },
            source: #{ ts_ms: ts, db: db, table: table },
            ts_ms: ts,
        }
    }
}

fn topic(db, table) {
    `sink/${db}/changes.${table}`
}
"""


@register(
    "rhai_script_bigquery_envelope",
    oracle=f"""
    WITH live AS ({ORACLE_LIVE_CHANGES}),
    all_changes AS (
        SELECT 'Backfill' AS op, o_orderkey AS okey FROM orders
        UNION ALL SELECT op, okey FROM live
    )
    SELECT CASE op WHEN 'Delete' THEN 'DELETE' ELSE 'UPSERT' END
               AS change_type,
           'testdb' AS tenant,
           COUNT(*) AS n,
           CAST(MIN(okey) AS BIGINT) AS min_okey,
           CAST(MAX(okey) AS BIGINT) AS max_okey
    FROM all_changes GROUP BY 1, 2
    """,
)
def rhai_script_bigquery_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A user SCRIPT (not the built-in builder) produces the flattened
    warehouse envelope over the merged stream: the Rhai-subset compiler
    (functions/rhai.py) turns `transform(db, table, op, before, after, ts)`
    into one codegen'd expression — if/else image choice, switch op
    mapping, field writes. Projected scalars are oracle-checked; byte
    equality of the full JSON against the built-in builder is asserted in
    tests/test_envelope.py."""
    from cdc_rs_spark.functions.rhai import rhai_transform_value

    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    merged = backfill.unionByName(live)
    f = rhai_transform_value(merged, RHAI_DEMO_SCRIPT)
    rows = merged.select(
        f["_CHANGE_TYPE"].alias("change_type"),
        f["tenant"].alias("tenant"),
        f["o_orderkey"].cast("bigint").alias("okey"),
    )
    return rows.groupBy("change_type", "tenant").agg(
        F.count("*").alias("n"),
        F.min("okey").alias("min_okey"),
        F.max("okey").alias("max_okey"),
    )


@register(
    "rhai_script_debezium_envelope",
    oracle=f"""
    WITH live AS ({ORACLE_LIVE_CHANGES}),
    all_changes AS (
        SELECT 'Backfill' AS op, 1::BIGINT AS ts FROM orders
        UNION ALL SELECT op, ts FROM live
    )
    SELECT CASE op WHEN 'Backfill' THEN 'c' WHEN 'Insert' THEN 'c'
                   WHEN 'Update' THEN 'u' WHEN 'Delete' THEN 'd'
                   ELSE op END AS opc,
           'testdb' AS src_db,
           COUNT(*) AS n,
           CAST(MIN(ts) AS BIGINT) AS min_ts,
           CAST(MAX(ts) AS BIGINT) AS max_ts
    FROM all_changes GROUP BY 1, 2
    """,
)
def rhai_script_debezium_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nested-envelope form from the same user script: `#{...}` map
    literals compile to structs (payload.source.db reachable as a struct
    path), the switch to a when-chain. Exercises nested literals + struct
    field access through the script compiler."""
    from cdc_rs_spark.functions.rhai import rhai_transform_value

    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    merged = backfill.unionByName(live)
    env = rhai_transform_value(merged, RHAI_DEMO_SCRIPT, fn="nested")
    rows = merged.select(
        env["payload"]["op"].alias("opc"),
        env["payload"]["source"]["db"].alias("src_db"),
        env["payload"]["ts_ms"].cast("bigint").alias("ts"),
    )
    return rows.groupBy("opc", "src_db").agg(
        F.count("*").alias("n"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


@register(
    "rhai_script_topic_routing",
    oracle=f"""
    WITH live AS ({ORACLE_LIVE_CHANGES}),
    all_changes AS (
        SELECT 'Backfill' AS op FROM orders
        UNION ALL SELECT op FROM live
    )
    SELECT 'sink/testdb/changes.orders' AS topic, COUNT(*) AS n
    FROM all_changes GROUP BY 1
    """,
)
def rhai_script_topic_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic routing from the script's `topic(db, table)` — backtick
    interpolation compiled to concat (reference host call
    src/main.rs:424-435)."""
    from cdc_rs_spark.functions.rhai import rhai_topic

    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    merged = backfill.unionByName(live)
    return (
        merged.select(rhai_topic(merged, RHAI_DEMO_SCRIPT).alias("topic"))
        .groupBy("topic")
        .agg(F.count("*").alias("n"))
    )


RHAI_SCORE_SCRIPT = """
// round-4 language notch (VERDICT r3 task 6): arrays, for loops, integer
// arithmetic, reassignment, .len(), parse_int — none of this surface is
// exercised by the reference's stock script (test.rhai), so it proves the
// compiler goes beyond transliterating the shipped example. The loop
// UNROLLS at compile time into fused column arithmetic.
fn score(db, table, op, before, after, ts) {
    let img = if op == "Delete" { before } else { after };
    let key = parse_int(img.o_orderkey);
    let weights = [3, 5, 7, 11];
    let acc = 0;
    for w in weights {
        acc = acc + (key % w) * w;
    }
    let mult = switch img.o_orderpriority {
        "1-URGENT" => 4,
        "2-HIGH" => 3,
        "3-MEDIUM" => 2,
        _ => 1,
    };
    #{ bucket: mult, risk: acc * mult + weights.len(), okey: key }
}
"""

_ORACLE_RISK = (
    "((okey % 3)*3 + (okey % 5)*5 + (okey % 7)*7 + (okey % 11)*11)"
)
_ORACLE_MULT = """CASE pri WHEN '1-URGENT' THEN 4 WHEN '2-HIGH' THEN 3
                           WHEN '3-MEDIUM' THEN 2 ELSE 1 END"""


@register(
    "rhai_script_array_loop_scoring",
    oracle=f"""
    WITH live AS (
        SELECT 'Update' AS op, o_orderkey AS okey, o_orderpriority AS pri
        FROM orders WHERE o_orderkey % 10 = 3
        UNION ALL
        SELECT 'Delete', o_orderkey, o_orderpriority
        FROM orders WHERE o_orderkey % 10 = 7
        UNION ALL
        SELECT 'Insert', o_orderkey + 10000000, o_orderpriority
        FROM orders WHERE o_orderkey % 10 = 1
    ),
    all_changes AS (
        SELECT 'Backfill' AS op, o_orderkey AS okey, o_orderpriority AS pri
        FROM orders
        UNION ALL SELECT op, okey, pri FROM live
    ),
    scored AS (
        SELECT {_ORACLE_MULT} AS bucket,
               {_ORACLE_RISK} * {_ORACLE_MULT} + 4 AS risk,
               okey
        FROM all_changes
    )
    SELECT bucket, COUNT(*) AS n,
           CAST(SUM(risk) AS BIGINT) AS sum_risk,
           CAST(MIN(okey) AS BIGINT) AS min_okey,
           CAST(MAX(okey) AS BIGINT) AS max_okey
    FROM scored GROUP BY bucket
    """,
)
def rhai_script_array_loop_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A user script USING THE EXTENDED LANGUAGE (arrays, for-loop
    unrolling, integer arithmetic with Spark's %-semantics, variable
    reassignment, .len(), parse_int) scores every change in the merged
    stream; the compiled plan is pure column arithmetic in whole-stage
    codegen. The per-row scores, priority buckets and aggregates are
    reproduced independently by the DuckDB oracle, and
    tests/test_envelope.py asserts the compiled expressions equal a
    mapInPandas run of functions/rhai.py's RhaiInterpreter over the same
    script — two engines, one AST."""
    from cdc_rs_spark.functions.rhai import rhai_transform_value

    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    merged = backfill.unionByName(live)
    f = rhai_transform_value(merged, RHAI_SCORE_SCRIPT, fn="score")
    rows = merged.select(
        f["bucket"].alias("bucket"),
        f["risk"].alias("risk"),
        f["okey"].alias("okey"),
    )
    return rows.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.sum("risk").alias("sum_risk"),
        F.min("okey").alias("min_okey"),
        F.max("okey").alias("max_okey"),
    )


RHAI_CLOSURE_WHILE_SCRIPT = """
// round-6 language notch (VERDICT r5 task 1): closures over a
// RUNTIME-bound range (map/filter/reduce/some compile to Spark's
// higher-order functions) and a `while` with a runtime bound (compiles
// to an aggregate() fold with a live-flag) — the full reference script
// surface (src/main.rs:396-422) riding JVM expression eval, no per-row VM.
fn score(db, table, op, before, after, ts) {
    let img = if op == "Delete" { before } else { after };
    let key = parse_int(img.o_orderkey);
    let xs = (0..(key % 7 + 3)).map(|i| (i * i + key) % 13);
    let odd = xs.filter(|i| i % 2 == 1);
    let acc = odd.reduce(|a, i| a + i, 0) + xs.len();
    let r = 0;
    while (r + 1) * (r + 1) <= acc {
        r = r + 1;
    }
    #{ okey: key, acc: acc, isqrt: r, any12: xs.some(|i| i >= 12) }
}
"""


@register(
    "rhai_script_closure_while_scoring",
    oracle="""
    WITH live AS (
        SELECT 'Update' AS op, o_orderkey AS okey
        FROM orders WHERE o_orderkey % 10 = 3
        UNION ALL
        SELECT 'Delete', o_orderkey
        FROM orders WHERE o_orderkey % 10 = 7
        UNION ALL
        SELECT 'Insert', o_orderkey + 10000000
        FROM orders WHERE o_orderkey % 10 = 1
    ),
    all_changes AS (
        SELECT CAST(o_orderkey AS BIGINT) AS okey FROM orders
        UNION ALL SELECT CAST(okey AS BIGINT) FROM live
    ),
    expanded AS (
        SELECT okey,
               [ (i*i + okey) % 13 FOR i IN range(0, okey % 7 + 3) ] AS xs
        FROM all_changes
    ),
    scored AS (
        SELECT okey,
               CAST(COALESCE(list_sum(list_filter(xs, i -> i % 2 = 1)), 0)
                    + len(xs) AS BIGINT) AS acc,
               list_max(xs) >= 12 AS any12
        FROM expanded
    ),
    rooted AS (
        SELECT okey, acc, any12,
               CAST(floor(sqrt(acc)) AS BIGINT) AS isqrt
        FROM scored
    )
    SELECT isqrt, any12, COUNT(*) AS n,
           CAST(SUM(acc) AS BIGINT) AS sum_acc,
           CAST(MIN(okey) AS BIGINT) AS min_okey,
           CAST(MAX(okey) AS BIGINT) AS max_okey
    FROM rooted GROUP BY isqrt, any12
    """,
)
def rhai_script_closure_while_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A user script using CLOSURES over a runtime-bound range and a
    `while` with a runtime bound — the round-6 compiled surface
    (functions/rhai.py:_while_fold/_closure_method). The range compiles to
    a guarded `sequence`, map/filter/reduce/some to transform/filter/
    aggregate/exists, and the integer-sqrt `while` to a capped fold, so
    the whole script is JVM column arithmetic (PLANS.md audit: python=0).
    The DuckDB oracle reproduces the same pipeline with list
    comprehensions + list_filter/list_sum and a closed-form isqrt =
    floor(sqrt(acc)) — exact for these magnitudes. Parity with the
    reference's embedded full-Rhai host: src/main.rs:396-422."""
    from cdc_rs_spark.functions.rhai import rhai_transform_columns

    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    merged = backfill.unionByName(live)
    # LOWERED compilation: each top-level `let` becomes a materialized
    # column, so the interpreted higher-order pipelines (xs/odd/acc)
    # evaluate ONCE per row however many downstream references exist —
    # measured 15 s -> ~2 s at sf0.1 vs the single-expression form
    lowered, val = rhai_transform_columns(
        merged, RHAI_CLOSURE_WHILE_SCRIPT, fn="score"
    )
    rows = lowered.select(
        val.get("okey").alias("okey"),
        val.get("acc").alias("acc"),
        val.get("isqrt").alias("isqrt"),
        val.get("any12").alias("any12"),
    )
    return rows.groupBy("isqrt", "any12").agg(
        F.count("*").alias("n"),
        F.sum("acc").alias("sum_acc"),
        F.min("okey").alias("min_okey"),
        F.max("okey").alias("max_okey"),
    )


_ORACLE_OP_RANK = """CASE op WHEN 'Update' THEN 3 WHEN 'Insert' THEN 2
                             WHEN 'Delete' THEN 1 ELSE 0 END"""

ASOF_POINTS = [50, 150, 250]


@register(
    "cdc_time_travel_asof",
    oracle=f"""
    WITH live AS ({ORACLE_LIVE_CHANGES}),
    backfill AS (
        SELECT 'Backfill' AS op, o_orderkey AS okey, 1::BIGINT AS ts,
               o_totalprice AS total
        FROM orders
    ),
    all_changes AS (
        SELECT op, okey, ts, total FROM backfill
        UNION ALL SELECT op, okey, ts, total FROM live
    ),
    horizons AS (SELECT * FROM (VALUES
        {", ".join(f"({t}::BIGINT)" for t in ASOF_POINTS)}) t(as_of_ts)),
    ranked AS (
        SELECT h.as_of_ts, c.op, c.okey, c.total,
               row_number() OVER (
                   PARTITION BY h.as_of_ts, c.okey
                   ORDER BY c.ts DESC, {_ORACLE_OP_RANK} DESC
               ) AS rn
        FROM all_changes c JOIN horizons h ON c.ts <= h.as_of_ts
    )
    SELECT as_of_ts, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
    FROM ranked WHERE rn = 1 AND op <> 'Delete'
    GROUP BY as_of_ts
    """,
)
def cdc_time_travel_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time replay (time travel): reconstruct the materialized
    table state AS OF each requested timestamp from the change history —
    the capability a CDC log + compaction rule implies but the reference
    binary never materializes (it only streams forward; src/main.rs:162-188
    has no replay path). For each horizon T the state is latest-per-key over
    changes with ts <= T, deletes tombstoned — exactly the
    cdc_compact_latest rule applied to a truncated log, so T before the
    live feed sees the pure backfill, T mid-feed sees updates/deletes
    applied but not the later inserts, and T after sees everything.

    Scale shape: one partitioned window per horizon over the ts-filtered
    log (the filter prunes at the scan); horizons are few and fixed by the
    audit being run, so the loop is a handful of shared-scan DAG branches,
    not a data-dimension. The per-state summary (count + exact-decimal sum)
    keeps the oracle hash cross-engine-stable."""
    from cdc_rs_spark.plans.relational import dsum

    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    log = backfill.unionByName(live)
    total = F.col("after")["o_totalprice"].cast("double")
    out = None
    for t in ASOF_POINTS:
        state = latest_per_key(
            log.filter(F.col("ts") <= t), drop_deletes=True
        )
        summary = state.agg(
            F.count("*").cast("bigint").alias("n_rows"),
            dsum(total).alias("sum_total"),
        ).select(
            F.lit(t).cast("bigint").alias("as_of_ts"), "n_rows", "sum_total"
        )
        out = summary if out is None else out.unionByName(summary)
    return out


@register(
    "cdc_retraction_algebra",
    oracle="""
    WITH retractions AS (
        -- Backfill: +after (the full snapshot)
        SELECT 1 AS sign, o_orderstatus AS status, o_totalprice AS total
        FROM orders
        UNION ALL
        -- Update (%10=3): -before +after
        SELECT -1, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 10 = 3
        UNION ALL
        SELECT 1, o_orderstatus, o_totalprice + 1000.0
        FROM orders WHERE o_orderkey % 10 = 3
        UNION ALL
        -- Delete (%10=7): -before
        SELECT -1, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 10 = 7
        UNION ALL
        -- Insert (%10=1, new key): +after
        SELECT 1, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 10 = 1
    ),
    net AS (
        SELECT status, CAST(SUM(sign) AS BIGINT) AS net_rows,
               CAST(SUM(CAST(sign * total AS DECIMAL(18,2))) AS DOUBLE)
                   AS net_total
        FROM retractions GROUP BY status
    ),
    state_rows AS (
        -- survivors: all non-deleted keys with updates applied, plus inserts
        SELECT o_orderstatus AS status,
               CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice + 1000.0
                    ELSE o_totalprice END AS total
        FROM orders WHERE o_orderkey % 10 <> 7
        UNION ALL
        SELECT o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 10 = 1
    ),
    state AS (
        SELECT status, CAST(COUNT(*) AS BIGINT) AS state_rows,
               CAST(SUM(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS state_total
        FROM state_rows GROUP BY status
    )
    SELECT n.status, n.net_rows, n.net_total,
           (n.net_rows = s.state_rows AND n.net_total = s.state_total)
               AS consistent
    FROM net n JOIN state s ON n.status = s.status
    """,
)
def cdc_retraction_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog inversion (Flink-style retraction streams): rewrite the
    upsert envelope as +1/-1 row deltas — Insert/Backfill emit +after,
    Update emits -before +after, Delete emits -before — and verify the
    algebra: summing the deltas per group must reproduce the compacted
    state's aggregates exactly. This is the building block of incremental
    view maintenance over NON-append views (downstream aggregates consume
    the deltas without ever seeing the full log), and the `consistent`
    column is the cross-check: a wrong before-image or a missed tombstone
    flips it to false and fails the oracle hash.

    Scale shape: the delta expansion is two narrow union'd projections of
    the log (no explode of the wide image through a join), the net
    aggregate is one map-side-combinable shuffle on the group key, and the
    state side reuses the latest-per-key compaction; deltas make the
    aggregate maintainable with O(groups) state instead of O(keys). Sums
    accumulate in exact decimal so +x and -x cancel bit-exactly. The
    oracle derives both sides independently from the fixture contract
    (sources/synthetic.py), so Spark's envelope round-trip (build images ->
    invert to deltas) is checked against first principles."""
    from cdc_rs_spark.plans.relational import dsum

    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    log = backfill.unionByName(live)

    def img(side: str):
        return (
            F.col(side)["o_orderstatus"].alias("status"),
            F.col(side)["o_totalprice"].cast("double").alias("total"),
        )

    minus = log.filter(F.col("op").isin("Update", "Delete")).select(
        F.lit(-1).alias("sign"), *img("before")
    )
    plus = log.filter(F.col("op").isin("Update", "Insert", "Backfill")).select(
        F.lit(1).alias("sign"), *img("after")
    )
    net = (
        minus.unionByName(plus)
        .groupBy("status")
        .agg(
            F.sum("sign").cast("bigint").alias("net_rows"),
            dsum(F.col("sign") * F.col("total")).alias("net_total"),
        )
    )
    state = (
        latest_per_key(log, drop_deletes=True)
        .select(*img("after"))
        .groupBy("status")
        .agg(
            F.count("*").cast("bigint").alias("state_rows"),
            dsum(F.col("total")).alias("state_total"),
        )
    )
    return net.join(state, "status").select(
        "status",
        "net_rows",
        "net_total",
        (
            (F.col("net_rows") == F.col("state_rows"))
            & (F.col("net_total") == F.col("state_total"))
        ).alias("consistent"),
    )


@register(
    "cdc_schema_evolution",
    oracle="""
    WITH survivors AS (
        SELECT o_orderkey AS okey, o_orderpriority,
               (o_orderkey % 10 = 3) AS updated
        FROM orders WHERE o_orderkey % 10 <> 7
        UNION ALL
        SELECT o_orderkey + 10000000, o_orderpriority, FALSE
        FROM orders WHERE o_orderkey % 10 = 1
    )
    SELECT CASE WHEN updated THEN
               CASE WHEN substring(o_orderpriority, 1, 1) IN ('1', '2')
                    THEN 'expedite' ELSE 'standard' END
           END AS priority_class,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MIN(okey) AS BIGINT) AS min_key
    FROM survivors GROUP BY 1
    """,
)
def cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mid-stream schema evolution: the live feed starts emitting an ADDED
    column (`o_priority_class`, a derivation the upstream app deployed with
    a DDL) that the backfill snapshot and earlier envelope rows never
    carried. The reference is schema-on-read by construction (rhai::Map
    rows, src/main.rs:442-507: column names come from the wire per row) —
    this query proves the engine's map-typed envelope preserves that
    property END TO END: v1 and v2 rows flow through the same compaction,
    and the typed projection over the evolved column yields NULL for every
    key whose latest image predates the DDL, with no migration step and no
    job restart.

    Scale shape: the added column is one `map_concat` on the v2 branch —
    a narrow projection; compaction and the final group-by are unchanged.
    The oracle derives the same tri-state (never-updated -> NULL,
    updated -> expedite/standard) from the fixture contract directly."""
    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    pclass = F.when(
        F.substring(F.col("after")["o_orderpriority"], 1, 1).isin("1", "2"),
        "expedite",
    ).otherwise("standard")
    v2_updates = live.filter(F.col("op") == "Update").withColumn(
        "after",
        F.map_concat(
            F.col("after"), F.create_map(F.lit("o_priority_class"), pclass)
        ),
    )
    log = backfill.unionByName(
        live.filter(F.col("op") != "Update")
    ).unionByName(v2_updates)
    state = latest_per_key(log, drop_deletes=True)
    return (
        state.select(
            F.col("after")["o_priority_class"].alias("priority_class"),
            F.col("after")["o_orderkey"].cast("bigint").alias("okey"),
        )
        .groupBy("priority_class")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.min("okey").cast("bigint").alias("min_key"),
        )
    )
