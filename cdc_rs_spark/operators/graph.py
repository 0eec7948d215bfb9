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


# ---- degree-aware hub salting (round 10, VERDICT r9 next #4) -------------
# The graph family's message joins shuffle edge rows on src: a power-law
# hub's rows all land in ONE reducer partition, and AQE's skew split only
# mitigates after the skewed shuffle files exist. part_degree_powerlaw_audit
# is the OBSERVABILITY side of that decision; these operators are the
# consuming side — the per-key form of the audit's tail test: any key whose
# degree crosses HUB_SALT_MIN_DEGREE (i.e. whose rows alone would exceed a
# healthy partition) gets its edge rows salted across HUB_SALT_BUCKETS
# sub-keys, and the small side (labels / frontier) replicates ONLY for those
# keys — the events_salted_user_join pattern, made degree-gated so a
# near-regular graph (this fixture, per the audit) pays nothing: the hub
# set is empty, every salt is 0, and the join is byte-identical to the
# unsalted form. Results are invariant by construction (the salt is a
# partitioning refinement of the same equi-join).

HUB_SALT_MIN_DEGREE = 4096  # a key this hot would dominate its partition
HUB_SALT_BUCKETS = 8


def hub_salt_plan(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_degree: int = HUB_SALT_MIN_DEGREE,
    n_salt: int = HUB_SALT_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """Compute the hub set (keys with degree >= min_degree — broadcast-
    sized BY DEFINITION: at most |E|/min_degree keys can be that hot) and
    attach a `_salt` column to the edge rows: pmod(xxhash64(dst), n_salt)
    for hub keys, 0 otherwise. One degree aggregate, paid ONCE before an
    iterative family's loop (degrees are static across rounds). Returns
    (pairs_salted, hubs)."""
    deg = pairs.groupBy(src).agg(F.count("*").alias("_deg"))
    hubs = deg.filter(F.col("_deg") >= min_degree).select(src)
    # fast path below the gate (one 1-row existence probe, paid once):
    # with NO hubs the salt column is constant 0 and the per-round join
    # needs neither the broadcast attach nor the replica explode —
    # returning hubs=None lets hub_salted_message_join run the PLAIN
    # join, so a regular graph pays only this probe (the r10 bench
    # showed the always-salted form taxing LPA ~25% at fixture scale)
    if hubs.limit(1).count() == 0:
        return pairs.withColumn("_salt", F.lit(0).cast("int")), None
    pairs_salted = (
        pairs.join(
            F.broadcast(hubs.withColumn("_is_hub", F.lit(True))), src, "left"
        )
        .withColumn(
            "_salt",
            F.when(
                F.col("_is_hub"),
                F.pmod(F.xxhash64(F.col(dst)), F.lit(n_salt)),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .drop("_is_hub")
    )
    return pairs_salted, hubs


def hub_salted_message_join(
    pairs_salted: DataFrame,
    small: DataFrame,
    hubs: DataFrame | None,
    src: str = "src",
    v: str = "v",
    n_salt: int = HUB_SALT_BUCKETS,
) -> DataFrame:
    """Join the salted edge rows against a small per-vertex table
    (labels, frontier) keyed `v`: the small side replicates n_salt ways
    for HUB keys only (explode over the salt range; non-hubs keep one
    row with salt 0), then the equi-join runs on (src = v, _salt) — a
    hub's messages now spread across n_salt reducer partitions, bounding
    every partition at ~max(min_degree, hub_degree / n_salt) rows.
    Output columns: the edge columns + the small side's non-key columns
    (the same frame the unsalted join produced, minus the plumbing).
    hubs=None (hub_salt_plan's below-the-gate fast path): the plain
    unsalted join — byte-identical plan to the pre-salting form."""
    if hubs is None:
        return pairs_salted.join(
            small, pairs_salted[src] == small[v]
        ).drop(v, "_salt")
    rep = (
        small.join(
            F.broadcast(
                hubs.select(
                    F.col(src).alias(v), F.lit(True).alias("_is_hub")
                )
            ),
            v,
            "left",
        )
        .withColumn(
            "_vsalt",
            # sequence/array of int literals already carry int elements;
            # a cast here would nest the generator inside an expression,
            # which Spark rejects
            F.explode(
                F.when(
                    F.col("_is_hub"),
                    F.sequence(F.lit(0), F.lit(n_salt - 1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("_is_hub")
    )
    return pairs_salted.join(
        rep,
        (pairs_salted[src] == rep[v])
        & (pairs_salted["_salt"] == rep["_vsalt"]),
    ).drop(v, "_salt", "_vsalt")
