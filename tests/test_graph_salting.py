"""Degree-aware hub salting (round 10, VERDICT r9 next #4): on a
planted power-law graph the salted message join must (a) return exactly
the unsalted join's rows, (b) bound per-reducer-key row counts at
~hub_degree / n_salt, and (c) stay a no-op (all salt 0, one replica) on
a regular graph — the gate that keeps the fixture queries byte-stable."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_rs_spark.operators.graph import (
    hub_salt_plan,
    hub_salted_message_join,
)


def _star_plus_ring(spark, hub_degree=300, ring=40):
    """One hub (vertex 0) with `hub_degree` out-edges plus a sparse ring
    — degree skew ~hub_degree : 2 (a 10x-and-more skewed fixture)."""
    edges = [(0, i) for i in range(1, hub_degree + 1)]
    edges += [
        (1000 + i, 1000 + (i + 1) % ring) for i in range(ring)
    ]
    return spark.createDataFrame(edges, "src bigint, dst bigint")


def test_salted_join_rows_identical_to_unsalted(spark):
    pairs = _star_plus_ring(spark)
    labels = (
        pairs.select(F.col("src").alias("v"))
        .unionByName(pairs.select(F.col("dst").alias("v")))
        .distinct()
        .select("v", (F.col("v") * 10).alias("lab"))
    )
    plain = pairs.join(labels, pairs["src"] == labels["v"]).select(
        "src", "dst", "lab"
    )
    ps, hubs = hub_salt_plan(pairs, min_degree=50, n_salt=4)
    salted = hub_salted_message_join(ps, labels, hubs, n_salt=4).select(
        "src", "dst", "lab"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salting_bounds_per_key_partition_rows(spark):
    """The scale claim: the hub's message rows spread across n_salt
    sub-keys, so the max per-(join-key) row count drops from hub_degree
    to ~hub_degree / n_salt."""
    pairs = _star_plus_ring(spark, hub_degree=400)
    ps, hubs = hub_salt_plan(pairs, min_degree=50, n_salt=8)
    assert {r["src"] for r in hubs.collect()} == {0}
    unsalted_max = (
        pairs.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    )
    salted_max = (
        ps.groupBy("src", "_salt").count().agg(F.max("count")).collect()[0][0]
    )
    assert unsalted_max == 400
    # xxhash64(dst) spread: each of 8 buckets gets ~50 rows; allow 2x
    assert salted_max <= 400 / 8 * 2
    # non-hub keys keep salt 0 — no pointless replication
    assert (
        ps.filter((F.col("src") != 0) & (F.col("_salt") != 0)).count() == 0
    )


def test_regular_graph_pays_nothing(spark):
    """Below the degree gate the hub set is empty, every salt is 0, and
    the small side keeps exactly one replica per vertex — the fixture
    queries' plans stay byte-identical to the unsalted form."""
    pairs = _star_plus_ring(spark, hub_degree=30)
    ps, hubs = hub_salt_plan(pairs, min_degree=50, n_salt=8)
    # below the gate the plan short-circuits: hubs=None, salt constant 0
    assert hubs is None
    assert ps.filter(F.col("_salt") != 0).count() == 0
    labels = ps.select(F.col("src").alias("v")).distinct().select(
        "v", F.col("v").alias("lab")
    )
    joined = hub_salted_message_join(ps, labels, hubs, n_salt=8)
    # one replica per vertex -> row count equals the plain join's
    plain_n = pairs.join(
        labels.withColumnRenamed("v", "src"), "src"
    ).count()
    assert joined.count() == plain_n


def test_lpa_result_invariant_under_planted_hub(spark):
    """Run the LPA round body both ways over a skewed graph: labels after
    2 rounds must be identical — salting is a partitioning refinement,
    never a semantic change."""
    pairs = _star_plus_ring(spark, hub_degree=200).localCheckpoint(
        eager=True
    )

    def run(salted: bool):
        if salted:
            ps, hubs = hub_salt_plan(pairs, min_degree=50, n_salt=4)
        labels = pairs.select(F.col("src").alias("v")).distinct().select(
            "v", F.col("v").alias("lab")
        )
        for _ in range(2):
            if salted:
                m = hub_salted_message_join(
                    ps, labels, hubs, "src", "v", n_salt=4
                ).groupBy("dst", "lab").agg(F.count("*").alias("n"))
            else:
                m = (
                    pairs.join(labels, pairs["src"] == labels["v"])
                    .groupBy("dst", "lab")
                    .agg(F.count("*").alias("n"))
                )
            labels = m.groupBy("dst").agg(
                F.max(
                    F.struct(F.col("n"), (-F.col("lab")).alias("neg"))
                ).alias("mx")
            ).select(F.col("dst").alias("v"), (-F.col("mx.neg")).alias("lab"))
        return sorted(map(tuple, labels.collect()))

    assert run(salted=False) == run(salted=True)
