"""Distributed connected components — the clustering step a dedup pipeline
runs AFTER pair generation: near-dup pairs are edges, each component is a
duplicate cluster, and the canonical document is the component's min id.

Algorithm: iterative min-label propagation (each vertex repeatedly adopts the
smallest label among itself and its neighbors) — the alternating/small-star
family of MapReduce CC algorithms specialized to the dedup workload, where
components are tiny (duplicate clusters of 2-50 docs) so the iteration count
is the cluster diameter, typically <= 4.

Scale design (100 TB corpus, billions of edges):
  - each round is one shuffle: edges join labels on dst (both sides can be
    pre-partitioned by vertex id so the join is co-located), then a
    map-side-combined min-groupBy on vertex.
  - `localCheckpoint` after every round truncates the lineage — without it
    the plan doubles per iteration and the DAG scheduler, not the data,
    becomes the bottleneck. The checkpoint is LAZY: the convergence probe
    materializes it, so each round is exactly ONE Spark action.
  - convergence detection exploits monotonicity: min-propagation can only
    LOWER labels, so the global label sum strictly decreases until the fix
    point — comparing per-round sums replaces a new-vs-old label join with a
    single aggregate (driver transfers one number per round, not data).

The reference has no graph surface at all; this exists for the
training-pipeline north star (BASELINE.json) — dedup clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 20
) -> DataFrame:
    """Return (v, component) for every vertex appearing in `edges`, where
    component = min vertex id reachable from v. Deterministic: the label is
    a pure function of the graph, independent of partitioning or iteration
    order.

    Raises RuntimeError if the fixpoint is not reached within `max_iter`
    rounds (round 8: min-label propagation needs component-diameter
    rounds, and a silently truncated run returns WRONG labels — a
    60-node path graph at the default 20 rounds mislabeled its tail in
    the union-find parity test). Callers with potentially high-diameter
    graphs raise `max_iter`; the dedup-cluster workload's diameter is
    bounded by duplicate-cluster size (module doc)."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.localCheckpoint(eager=True)  # pair generation runs once, not per round
    labels = (
        sym.select(F.col("a").alias("v"))
        .distinct()
        .withColumn("component", F.col("v"))
    )
    prev_sum: int | None = None
    converged = False
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["b"] == labels["v"])
            .select(sym["a"].alias("v"), F.col("component"))
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("v")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)  # materialized by the probe below
        )
        # one action per round: materializes the checkpoint AND probes
        # convergence (labels only ever decrease -> equal sum == fix point)
        label_sum = new_labels.agg(F.sum("component")).collect()[0][0]
        labels = new_labels
        if label_sum == prev_sum:
            converged = True
            break
        prev_sum = label_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not reach its fixpoint within "
            f"{max_iter} rounds — the graph's component diameter exceeds "
            "max_iter and the labels would be silently wrong; raise "
            "max_iter (rounds needed ~ component diameter)"
        )
    return labels
