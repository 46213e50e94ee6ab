"""Connected components over near-duplicate pairs: the step that turns
pairwise dedup candidates into DEDUP GROUPS (keep one doc per
component, drop the rest).

Iterative min-label propagation on DataFrames: every node starts as its
own component; each round a node adopts the minimum label among itself
and its neighbors; converged when no label changes.  Rounds are
distributed joins (one shuffle each); the driver only checks the
converged counter.  Rounds needed = graph diameter — for near-dup
graphs that is tiny (dup clusters are cliques or short chains).

At 100 TB: persist each iteration's labels (done below) so lineage
doesn't re-execute from the source; for adversarial graphs with large
diameter, switch to the alternating large-star/small-star algorithm
(same join primitives, O(log n) rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(pairs: DataFrame,
                         src: str = "id_a", dst: str = "id_b",
                         max_iter: int = 20) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    component = minimum node id reachable through the pair graph."""
    # hash-partition the cached edges by the per-round join key: the
    # cached partitioning satisfies the join's distribution requirement,
    # so every iteration shuffles only the (much smaller) labels side —
    # one extra exchange now buys one fewer exchange of the full edge
    # relation per round.
    edges = (pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
             .unionAll(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
             .distinct()
             .repartition("v")
             .persist())
    labels = (edges.select(F.col("u").alias("node"))
              .distinct()
              .withColumn("comp", F.col("node")))
    persisted_prev = None
    for _ in range(max_iter):
        # candidate label per node: min over neighbors' current labels
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("comp").alias("nmin")))
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select("node",
                    F.least(F.col("comp"), F.coalesce("nmin", F.col("comp")))
                     .alias("comp"),
                    (F.col("nmin") < F.col("comp")).alias("changed"))
        ).persist()
        n_changed = new_labels.filter(F.col("changed")).count()
        # the count above materialized new_labels; the previous
        # iteration's cache is no longer referenced — release it
        if persisted_prev is not None:
            persisted_prev.unpersist()
        persisted_prev = new_labels
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break
    edges.unpersist()
    return labels
