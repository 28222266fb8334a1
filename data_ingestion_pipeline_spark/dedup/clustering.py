"""Near-duplicate clustering: connected components over candidate pairs.

Pair detection (ngram/minhash/simhash/embedding) yields EDGES; dedup needs
GROUPS — "keep one doc per component of the near-dup graph". Components
come from iterative min-label propagation, the standard Spark-sized
formulation (what GraphX/GraphFrames run underneath):

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated until a fixpoint; every node ends up labeled with the smallest id
reachable from it. Convergence is O(component diameter) rounds — near-dup
graphs are shallow (dup clusters are cliques or short chains), so a handful
of iterations closes even huge corpora.

Scale mechanics:
- each round is one join (labels ⋈ edges) + one groupBy min — shuffle on
  node id both times, no driver-side graph;
- ``localCheckpoint`` every round truncates the lineage (iterative plans
  otherwise grow unboundedly and re-execute from the scan each round);
- the convergence check is a 1-row aggregate (count of changed labels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_groups"]


def connected_components(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """(node, cluster_id) for every node in ``pairs``; cluster_id = min node
    id of its component. Deterministic for any edge order/partitioning."""
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .unionByName(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        # carry the old label through the checkpoint so the convergence
        # check is a scan of materialized rows, not a second old⋈new join
        joined = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.col("label").alias("_old"),
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = joined.filter(F.col("label") != F.col("_old")).count()
        labels = joined.select("node", "label")
        if changed == 0:
            break
    else:
        # Returning partial labels would silently keep extra duplicate
        # survivors downstream; a component with diameter > max_iter is a
        # correctness error, not a degraded answer.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            f"({changed} labels still changing); raise max_iter — the dup "
            "graph has a component with a larger diameter"
        )
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def dedup_groups(pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b") -> DataFrame:
    """Components + the keep/drop decision: the canonical (min-id) member of
    each cluster survives."""
    cc = connected_components(pairs, a_col, b_col)
    return cc.withColumn("keep", (F.col("node") == F.col("cluster_id")).cast("boolean"))
