"""IVF (inverted-file) approximate nearest neighbors — the partition-pruned
scale path for ANN, complementing the hyperplane LSH in similarity/lsh.py.

Classic IVF-Flat: pick C coarse centroids, assign every corpus vector to
its nearest centroid ("inverted list"), and at query time score only the
``nprobe`` lists whose centroids are closest to the query. Candidate count
drops from N to ~N·nprobe/C with recall controlled by nprobe.

Design for 100 TB:
- Centroids are a deterministic strided sample of the corpus (ids 0,
  stride, 2·stride, …) — no RNG, no iterative training, reproducible on
  every executor and every run. A k-means refinement is a drop-in upgrade
  (recompute centroids offline, same assignment expression) but the index
  structure and query path don't change.
- The centroid set is tiny (C ≈ √N rows of dim doubles) → collected to the
  driver and baked into the plan as literals; assignment is a codegen'd
  argmax over C dot products, a narrow map with no shuffle.
- In production the assigned corpus is written partitioned by ``list_id``
  so a query's nprobe lists map to nprobe partition reads — partition
  pruning does candidate selection before any compute (same pattern as the
  LSH bucket column, but with data-adaptive cells instead of fixed planes).
- Query fan-out is an explode of nprobe (query, list_id) pairs + an
  equi-join on list_id — never a cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.functions.vector import as_double_array, cosine, dot

__all__ = ["sample_centroids", "assign_expr", "ivf_assign", "ivf_topk"]


def sample_centroids(
    corpus: DataFrame, n_centroids: int = 16, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic strided sample as coarse centroids.

    Stride is computed from the corpus count so the sample spans the id
    range regardless of scale factor. Returns plain lists (the "model" is
    just C·dim doubles — plan-literal sized).
    """
    n = corpus.count()
    stride = max(n // n_centroids, 1)
    rows = (
        corpus.filter((F.col(id_col) % stride == 0) & (F.col(id_col) < stride * n_centroids))
        .select(F.col(id_col), as_double_array(F.col(vec_col)).alias("v"))
        .orderBy(id_col)
        .collect()
    )
    return [list(r["v"]) for r in rows]


def assign_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid id (argmax of dot products, first-wins on ties) —
    one codegen'd expression, no UDF, no shuffle."""
    scores = F.array(
        *[dot(vec, F.array(*[F.lit(x) for x in c])) for c in centroids]
    )
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")


def ivf_assign(
    corpus: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Corpus → corpus + ``list_id``: the inverted-file assignment. Persist
    this partitioned by list_id to make probes partition-pruned reads."""
    return corpus.withColumn("list_id", assign_expr(as_double_array(F.col(vec_col)), centroids))


def ivf_topk(
    corpus: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k per query, scoring only the nprobe nearest lists.

    query_df: (query_id, qvec). The query side expands to nprobe rows per
    query (explode of its closest centroid ids) and equi-joins the assigned
    corpus on list_id — broadcast, since queries are few.
    """
    centroids = sample_centroids(corpus, n_centroids, id_col=id_col)
    assigned = ivf_assign(corpus, centroids)

    qvec = as_double_array(F.col("qvec"))
    cscores = F.array(
        *[
            F.struct(
                dot(qvec, F.array(*[F.lit(x) for x in c])).alias("s"),
                F.lit(i).cast("int").alias("list_id"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    probes = query_df.withColumn(
        "list_id",
        F.explode(
            F.transform(
                F.slice(F.reverse(F.array_sort(cscores)), 1, nprobe),
                lambda s: s["list_id"],
            )
        ),
    )

    scored = assigned.join(F.broadcast(probes), ["list_id"]).select(
        "query_id",
        F.col(id_col),
        cosine(as_double_array(F.col("embedding")), as_double_array(F.col("qvec"))).alias(
            "score"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("score", 6).alias("score"), "rank")
    )
