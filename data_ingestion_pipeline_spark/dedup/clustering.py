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

__all__ = [
    "connected_components",
    "connected_components_star",
    "dedup_groups",
]


def connected_components(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """(node, cluster_id) for every node in ``pairs``; cluster_id = min node
    id of its component. Deterministic for any edge order/partitioning."""
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .unionByName(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
        # lazy: the first iteration's action materializes it (r11 — one
        # fewer job; see connected_components_star)
        .localCheckpoint(eager=False)
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
            .localCheckpoint(eager=False)
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


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set in (big, small) orientation, self-loops dropped."""
    return (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges_canon: DataFrame) -> DataFrame:
    """Large-star round: every node's strictly-larger neighbors reconnect to
    the minimum of its closed neighborhood."""
    sym = edges_canon.unionByName(
        edges_canon.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    nmin = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    m = F.least(F.col("_mn"), F.col("u"))
    return _canonical(
        sym.join(nmin, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
    )


def _small_star(edges_canon: DataFrame) -> DataFrame:
    """Small-star round: every node's smaller-or-equal neighbors (and the
    node itself) reconnect to the minimum among them."""
    nmin = edges_canon.groupBy("u").agg(F.min("v").alias("_mn"))
    rewired = (
        edges_canon.join(nmin, "u")
        .select(F.col("v").alias("u"), F.col("_mn").alias("v"))
    )
    self_edge = nmin.select("u", F.col("_mn").alias("v"))
    return _canonical(rewired.unionByName(self_edge))


def connected_components_star(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """Two-phase star contraction (Kiveris et al., "Connected Components in
    MapReduce and Beyond"): alternate large-star and small-star rounds until
    the edge set is a fixpoint, at which point every node holds a direct
    edge to its component minimum.

    Same output contract as ``connected_components``: (node, cluster_id),
    cluster_id = min node id of the component, deterministic for any edge
    order/partitioning. The difference is convergence DEPTH: label
    propagation needs O(component diameter) rounds — fine for shallow dup
    cliques, pathological on chains — while star contraction halves path
    lengths every round, closing an n-node chain in O(log n) alternations.
    Each round is the same shuffle shape (groupBy-min on node + a join), so
    the crossover is purely about graph topology, not per-round cost.
    """
    # Materialize the raw pair projection ONCE: both the edge set and the
    # node set derive from it, and the pairs lineage is typically the
    # expensive part (a banded near-dup join). Deriving nodes straight from
    # `pairs` would replay that subtree a second time (measured +50% on
    # near_dup_clusters_star at sf0.1 — the round-7 regression).
    raw = pairs.select(
        F.col(a_col).alias("u"), F.col(b_col).alias("v")
        # lazy pins throughout (r11): the _sig action below materializes
        # raw+edges in ONE job instead of one eager-checkpoint job per pin
        # plus the sig job — the contraction loop runs on tiny edge sets
        # where per-job overhead, not data, is the cost
    ).localCheckpoint(eager=False)
    edges = _canonical(raw).localCheckpoint(eager=False)
    # nodes come from the RAW pairs, not the canonicalized edges: a node
    # that appears only in self-pairs (id_a == id_b) has every edge dropped
    # by _canonical, but the contract (same as connected_components) still
    # owes it a (node, node) singleton row via the roots anti-join below
    nodes = (
        raw.select(F.col("u").alias("node"))
        .unionByName(raw.select(F.col("v").alias("node")))
        .distinct()
        # consumed once, by the final roots anti-join, over the pinned raw
        .localCheckpoint(eager=False)
    )
    # fixpoint check on the materialized canonical sets: equal counts AND
    # an order-insensitive 64-bit hash fold (1-row aggregate, no
    # full-relation diff join; XOR, not SUM — a long SUM of xxhash64
    # values overflows and throws under ANSI mode). The previous round's
    # signature is carried over, so each round costs one aggregate job.
    def _sig(e: DataFrame):
        return e.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).first()

    prev_sig = _sig(edges)
    for _ in range(max_iter):
        contracted = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        sig = _sig(contracted)
        edges = contracted
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "alternation rounds — raise max_iter"
        )
    # fixpoint edges form stars: (u=node, v=component min) for every
    # non-root node; roots appear only on the v side
    labels = edges.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
    roots = nodes.join(
        edges.select(F.col("u").alias("node")), "node", "left_anti"
    ).select("node", F.col("node").alias("cluster_id"))
    return labels.unionByName(roots)
