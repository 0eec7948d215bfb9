"""Dump non-vacuous before/after plans for the round-13 (session 2) fold
changes, by building the exact intermediate frames clusters_foreach_batch /
remove_docs construct against a scratch group store:

  known_edges_before.txt   known-group edges from a LAZY group-store re-read
                           (parquet scan + tombstone anti-join per batch)
  known_edges_after.txt    known-group edges derived from the CHECKPOINTED
                           pin aggregate (collect_set explode — no second
                           group-store scan)
  removedocs_memblive_before.txt  gs.distinct().join(live_members): the
                           dedup exchange runs over the whole store
  removedocs_memblive_after.txt   gs.join(live_members).distinct(): the
                           broadcast semi-prune runs first
  gdprv2_groupcounts_before.txt   the three separate distinct+agg jobs
  gdprv2_groupcounts_after.txt    the fused one-pass per-gkey aggregate

Usage: python tools/dump_fold_plans_r13b.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fmt(df) -> str:
    import re

    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # formatted mode names nodes as "(n) Exchange" with the partitioning in
    # an Arguments: line — count shuffle exchanges from the detail section
    n_ex = len(re.findall(r"^\(\d+\) Exchange\s*$", plan, re.M))
    n_bc = len(re.findall(r"^\(\d+\) BroadcastExchange\s*$", plan, re.M))
    n_scan = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    return (
        f"-- shuffle Exchange nodes: {n_ex}; broadcast exchanges: {n_bc}; "
        f"parquet scans: {n_scan}\n{plan}"
    )


def main() -> int:
    from pyspark.sql import functions as F

    from cdc_rs_spark.session import get_spark
    from cdc_rs_spark.streaming.clusters import _GROUP_SCHEMA

    spark = get_spark("dump-fold-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    root = tempfile.mkdtemp(prefix="fold_plan_")
    try:
        gpath = os.path.join(root, "groups")
        spark.createDataFrame(
            [("g%d" % i, i, True) for i in range(64)], _GROUP_SCHEMA
        ).write.parquet(gpath)
        tomb = spark.createDataFrame([(999,)], "doc_id bigint")
        gstore = spark.read.schema(_GROUP_SCHEMA).parquet(gpath)
        batch_gkeys = spark.createDataFrame(
            [("g%d" % i,) for i in range(8)], "gkey string"
        ).localCheckpoint(eager=True)
        groups = batch_gkeys.withColumn("rep_id", F.lit(7).cast("bigint"))
        live_del = (
            gstore.filter("delegate")
            .join(F.broadcast(batch_gkeys), "gkey")
            .select("gkey", F.col("doc_id").alias("del_id"))
            .join(
                F.broadcast(tomb).withColumnRenamed("doc_id", "del_id"),
                "del_id",
                "left_anti",
            )
        )
        # BEFORE: the old known subtree — a second parquet scan of the
        # corpus-sized group store inside the per-batch pair plan
        known_before = (
            live_del.join(
                F.broadcast(groups.select("gkey", "rep_id")), "gkey"
            )
            .filter(F.col("del_id") != F.col("rep_id"))
            .select(
                F.col("rep_id").alias("id_a"), F.col("del_id").alias("id_b")
            )
        )
        # AFTER: the checkpointed pin aggregate carries the delegate sets
        ldset = (
            live_del.groupBy("gkey")
            .agg(F.collect_set("del_id").alias("__dels"))
            .localCheckpoint(eager=True)
        )
        known_after = (
            ldset.select("gkey", F.explode("__dels").alias("del_id"))
            .join(F.broadcast(groups.select("gkey", "rep_id")), "gkey")
            .filter(F.col("del_id") != F.col("rep_id"))
            .select(
                F.col("rep_id").alias("id_a"), F.col("del_id").alias("id_b")
            )
        )
        with open(os.path.join(out_dir, "known_edges_before.txt"), "w") as f:
            f.write(fmt(known_before))
        with open(os.path.join(out_dir, "known_edges_after.txt"), "w") as f:
            f.write(fmt(known_after))

        # remove_docs memb_live: distinct-then-join vs join-then-distinct
        live_members = spark.createDataFrame(
            [(i,) for i in range(8)], "doc_id bigint"
        ).localCheckpoint(eager=True)
        before = (
            gstore.select("gkey", "doc_id")
            .distinct()
            .join(live_members, "doc_id")
        )
        after = (
            gstore.select("gkey", "doc_id")
            .join(live_members, "doc_id")
            .distinct()
        )
        with open(
            os.path.join(out_dir, "removedocs_memblive_before.txt"), "w"
        ) as f:
            f.write(fmt(before))
        with open(
            os.path.join(out_dir, "removedocs_memblive_after.txt"), "w"
        ) as f:
            f.write(fmt(after))

        # gdpr_v2 chain_clusters group-store counts: 3 jobs -> 1
        subj = spark.createDataFrame([(i,) for i in range(4)], "doc_id bigint")
        ms = gstore.select("gkey", "doc_id").distinct()
        b1 = ms.select("gkey").distinct().agg(F.count(F.lit(1)))
        b2 = (
            ms.join(subj, "doc_id", "left_anti")
            .select("gkey")
            .distinct()
            .agg(F.count(F.lit(1)))
        )
        b3 = ms.join(subj, "doc_id").select("doc_id").distinct().agg(
            F.count(F.lit(1))
        )
        subj_m = F.broadcast(subj.withColumn("__m", F.lit(True)))
        per_g = (
            gstore.select("gkey", "doc_id")
            .distinct()
            .join(subj_m, "doc_id", "left")
            .groupBy("gkey")
            .agg(
                F.count(F.col("__m")).alias("__ns"),
                F.count(F.when(F.col("__m").isNull(), F.lit(1))).alias(
                    "__nn"
                ),
            )
        )
        fused = per_g.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum((F.col("__nn") > 0).cast("bigint")).alias("n_surv"),
            F.sum("__ns").alias("n_gdocs"),
        )
        with open(
            os.path.join(out_dir, "gdprv2_groupcounts_before.txt"), "w"
        ) as f:
            f.write(
                "-- THREE separate jobs (each scans the group store):\n\n"
                + "\n\n== n_groups ==\n"
                + fmt(b1)
                + "\n\n== n_groups_surviving ==\n"
                + fmt(b2)
                + "\n\n== n_gdocs ==\n"
                + fmt(b3)
            )
        with open(
            os.path.join(out_dir, "gdprv2_groupcounts_after.txt"), "w"
        ) as f:
            f.write("-- ONE job, one group-store scan:\n\n" + fmt(fused))
        print("wrote 6 plan files to", out_dir)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
