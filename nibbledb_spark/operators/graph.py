"""Distributed connected components for dedup clustering.

Near-dup PAIRS are not a dedup policy: pairwise "drop the higher id"
breaks on transitivity (a~b, b~c but not a~c — dropping b and c loses a
representative of the b/c cluster; keeping c contradicts b~c). The
production shape for an LLM corpus is pairs -> connected components ->
keep one canonical doc per component. This module provides the
component step as a first-class distributed operator.

Algorithm: hash-min label propagation over the symmetrized edge list —
every round each node adopts the minimum label in its closed
neighborhood, so the component root's id floods outward; converges in
O(diameter) rounds. Near-dup graphs are dense near-cliques (that is
what "near duplicate" means), so the diameter is small and the round
count is effectively constant; the O(log n) large-star/small-star
variant (Kiveris et al., Connected Components in MapReduce and Beyond,
SoCC'14; pattern in PAPERS.md) is the drop-in upgrade if a pathological
long-chain graph ever matters.

Scale shape per round: one keyed shuffle of the edge list (join on the
node id) and one map-side-combined min-aggregate of the labels —
nothing quadratic, no driver-side graph. The driver loop holds only the
convergence counter, never rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``edges``; ``component`` is
    the minimum node id reachable from ``node`` (the cluster's stable
    canonical representative).

    Nodes with no edges are absent from the output — join the caller's
    universe with ``F.coalesce(component, node)`` for singleton
    semantics (see ``dedup.near_dup_components``).

    Raises ``RuntimeError`` if ``max_iter`` rounds do not converge
    (diameter > max_iter — not a near-dup-shaped graph).
    """
    e = edges.select(F.col(src).alias("node"), F.col(dst).alias("peer"))
    sym = (
        e.unionByName(
            e.select(F.col("peer").alias("node"), F.col("node").alias("peer"))
        )
        .where(F.col("node") != F.col("peer"))
        .distinct()
        .persist()
    )
    labels = sym.select("node").distinct().withColumn("label", F.col("node")).persist()
    labels.count()  # materialize so each round starts from a fixed frame

    try:
        for _ in range(max_iter):
            msgs = sym.join(labels, "node").select(
                F.col("peer").alias("node"), "label"
            )
            # localCheckpoint (not just persist): each round's frame is
            # built on the previous round's, so without truncation the
            # logical plan DOUBLES per round and planning itself OOMs
            # after ~20 rounds on a long-diameter graph. Checkpointing
            # cuts the lineage to the materialized result — the standard
            # requirement for iterative DataFrame algorithms. (On a
            # cluster with executor loss concerns, swap for reliable
            # checkpoint() against a checkpoint dir.)
            new = (
                labels.unionByName(msgs)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
                .localCheckpoint(eager=True)
            )
            changed = (
                new.alias("n")
                .join(labels.alias("o"), "node")
                .where(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels.unpersist()
            labels = new
            if changed == 0:
                return labels.select(
                    F.col("node"), F.col("label").alias("component")
                )
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    finally:
        sym.unpersist()
