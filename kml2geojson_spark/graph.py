"""Distributed connected components (dedup-cluster labeling).

Near-duplicate pairs (SimHash/MinHash/cosine) are edges; the training-
data pipeline needs the connected COMPONENTS to pick one keeper per
cluster. The reference has no graph operators (it is a KML converter,
/root/reference/kml2geojson/main.py); this is part of the §2.3-style
extension surface.

Algorithm: iterative min-label propagation — every node starts labeled
with its own id; each round, a node takes the min of its label and its
neighbours' labels; converged when nothing changes. Each round is one
hash join (edges ⋈ labels on src) + one groupBy-min — both shuffles on
the node id, so Catalyst reuses the hash partitioning across rounds.
Rounds needed = graph diameter (near-dup clusters are shallow — star- or
clique-like — so typically 2-5). Lineage is truncated per round with
``localCheckpoint`` so the plan does not grow unboundedly; on a real
cluster use ``spark.sparkContext.setCheckpointDir`` + ``checkpoint()``
for fault-tolerant truncation instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, *, src: str = "doc_a",
                         dst: str = "doc_b",
                         max_iters: int = 50) -> DataFrame:
    """Label every node that appears in ``edges`` with the minimum node
    id reachable from it. Output: (node, component), component = min id
    of the node's connected component. Deterministic; equals the
    transitive-closure min a recursive-CTE oracle computes.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = (e.union(e.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst")))
           .distinct()
           .localCheckpoint(eager=True))
    labels = (sym.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node")))

    converged = False
    for _ in range(max_iters):
        nbr = (sym.join(labels, sym["src"] == labels["node"])
               .select(F.col("dst").alias("node"), F.col("label")))
        new_labels = (labels.unionByName(nbr)
                      .groupBy("node").agg(F.min("label").alias("label"))
                      .localCheckpoint(eager=True))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .where(F.col("n.label") != F.col("o.label"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # one hop per round: rounds needed = distance to the component's
        # min-id node. Returning silently here would hand back WRONG
        # labels (duplicate docs kept across what is really one cluster).
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds; "
            "the graph has a longer min-label path — raise max_iters")
    return labels.select(F.col("node"), F.col("label").alias("component"))
