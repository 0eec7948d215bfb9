"""snapshot_jdbc against a LIVE database (embedded Derby ships in Spark's
jars): create a real table over JDBC, run the partitioned snapshot read,
and assert the Change envelope, the parallel range partitioning (the
scale analog of the reference's keyset pagination, src/main.rs:325-349),
and selection pushdown. Closes the 'JDBC path never ran against a real
database' fidelity gap within the sandbox."""

from __future__ import annotations

import pytest


@pytest.fixture()
def derby_orders(spark, tmp_path):
    db_path = str(tmp_path / "derbydb")
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(
        f"jdbc:derby:{db_path};create=true"
    )
    st = conn.createStatement()
    st.execute("CREATE SCHEMA TESTDB")
    st.execute(
        "CREATE TABLE TESTDB.ORDERS ("
        "O_ORDERKEY INT PRIMARY KEY, "
        "O_TOTALPRICE DOUBLE, "
        "O_STATUS VARCHAR(10))"
    )
    ps = conn.prepareStatement(
        "INSERT INTO TESTDB.ORDERS VALUES (?, ?, ?)"
    )
    for k in range(1, 101):
        ps.setInt(1, k)
        ps.setDouble(2, k * 1.5)
        ps.setString(3, "OPEN" if k % 3 else "DONE")
        ps.addBatch()
    ps.executeBatch()
    conn.close()
    yield db_path


def test_snapshot_jdbc_partitioned_live_database(spark, derby_orders):
    from cdc_rs_spark.sources.backfill import BackfillJob, snapshot_jdbc

    job = BackfillJob(db="TESTDB", relation="ORDERS", pkey="O_ORDERKEY")
    changes = snapshot_jdbc(
        spark,
        f"jdbc:derby:{derby_orders}",
        job,
        num_partitions=4,
        lower_bound=1,
        upper_bound=101,
        properties={"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
    )
    # the partitioned read plans 4 parallel range queries — the keyset-
    # pagination analog; the envelope projection preserves them
    assert changes.rdd.getNumPartitions() == 4
    rows = changes.collect()
    assert len(rows) == 100
    assert {r["op"] for r in rows} == {"Backfill"}
    assert all(r["before"] is None for r in rows)
    by_key = {int(r["after"]["O_ORDERKEY"]): r["after"] for r in rows}
    assert len(by_key) == 100
    assert by_key[2]["O_TOTALPRICE"] == "3.0"  # stringified envelope image
    assert by_key[3]["O_STATUS"] == "DONE"


def test_snapshot_jdbc_selection_pushdown(spark, derby_orders):
    """`selection` maps to column pruning that reaches the JDBC scan — the
    analog of interpolating {selection} into the reference's SELECT
    (src/main.rs:326,331)."""
    from cdc_rs_spark.sources.backfill import BackfillJob, snapshot_jdbc

    job = BackfillJob(
        db="TESTDB",
        relation="ORDERS",
        pkey="O_ORDERKEY",
        selection="O_ORDERKEY, O_STATUS",
    )
    changes = snapshot_jdbc(
        spark,
        f"jdbc:derby:{derby_orders}",
        job,
        properties={"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
    )
    rows = changes.collect()
    assert len(rows) == 100
    assert set(rows[0]["after"].keys()) == {"O_ORDERKEY", "O_STATUS"}
    plan = changes._jdf.queryExecution().executedPlan().toString()
    assert "O_TOTALPRICE" not in plan  # pruned before the JDBC scan
