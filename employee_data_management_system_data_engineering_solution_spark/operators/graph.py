"""Connected components over an edge list — the clustering stage of
near-duplicate deduplication.

Pairwise dedup (LSH → verified pairs) leaves TRANSITIVE duplicates in
separate rows: A≈B and B≈C must collapse into one cluster {A,B,C} so a
single representative survives. That closure is a connected-components
problem; the reference engine has nothing like it (north-star
extension, SURVEY §2.11.1).

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round every node takes the min of its own label and
its neighbors' labels; converged when no label changes. Rounds needed =
graph diameter, which for near-dup clusters is tiny (dup groups are
near-cliques, diameter ≤ 2–3). Each round is one shuffle join + one
groupBy — both on the node id — and lineage is truncated with
``localCheckpoint`` so the plan doesn't grow per iteration (on a real
cluster, use ``spark.sparkContext.setCheckpointDir`` + ``checkpoint``
for fault-tolerant truncation). For web-scale graphs with long chains,
swap in large-star/small-star (Kiveris et al., "Connected Components
in MapReduce and Beyond") — same DataFrame skeleton, different
neighbor rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 15,
) -> DataFrame:
    """(node, component) for every node in ``edges``; ``component`` is
    the minimum node id reachable from the node. Undirected: each edge
    is used in both directions. Raises if not converged in
    ``max_iter`` rounds (near-dup graphs converge in ≤ 3–4)."""
    und = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    und = und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)

    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    def propagate(cur: DataFrame) -> DataFrame:
        nbr_min = (
            und.join(cur, und["dst"] == cur["node"])
            .groupBy(und["src"].alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        return (
            cur.alias("l")
            .join(nbr_min.alias("n"), "node", "left")
            .select(
                "node",
                F.least(
                    F.col("l.component"),
                    F.coalesce(F.col("n.nbr_component"), F.col("l.component")),
                ).alias("component"),
            )
        )

    for _ in range(max_iter):
        # two propagation rounds per convergence check: the check is a
        # full driver action (join + count), and near-dup graphs
        # converge in 2-3 rounds — halving the actions matters more
        # than the extra (cheap) round a tight loop would save
        new_labels = propagate(propagate(labels)).localCheckpoint(eager=True)
        n_changed = (
            new_labels.alias("a")
            .join(labels.alias("b"), "node")
            .filter(F.col("a.component") != F.col("b.component"))
            .count()
        )
        labels = new_labels
        if n_changed == 0:
            return labels
    raise RuntimeError(f"connected_components: no convergence in {2 * max_iter} rounds")
