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

from data_ingestion_pipeline_spark.functions.partitioning import fan_out
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
    one expression, no UDF, no shuffle. Fold-form dots: assignment is
    once-per-row, where a C×dim unrolled expression would cost more in
    plan compile time than it saves in eval (see lsh.bucket_expr)."""
    scores = F.array(
        *[dot(vec, F.array(*[F.lit(x) for x in c])) for c in centroids]
    )
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")


def ivf_assign(
    corpus: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Corpus → corpus + ``list_id``: the inverted-file assignment. Persist
    this partitioned by list_id to make probes partition-pruned reads.
    The double-cast is projected to a bound column first — the unrolled
    centroid dots index it element-wise, and indexing a cast expression
    would re-cast the array per term (O(C·dim²)/row)."""
    return (
        corpus.withColumn("_vd", as_double_array(F.col(vec_col)))
        .withColumn("list_id", assign_expr(F.col("_vd"), centroids))
        .drop("_vd")
    )


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
    corpus_d = fan_out(corpus).select(
        F.col(id_col), as_double_array(F.col("embedding")).alias("_v")
    )
    assigned = corpus_d.withColumn("list_id", assign_expr(F.col("_v"), centroids))

    q = query_df.select("query_id", as_double_array(F.col("qvec")).alias("_qv"))
    cscores = F.array(
        *[
            F.struct(
                dot(F.col("_qv"), F.array(*[F.lit(x) for x in c])).alias("s"),
                F.lit(i).cast("int").alias("list_id"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    probes = q.withColumn(
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
        cosine(F.col("_v"), F.col("_qv")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("score", 6).alias("score"), "rank")
    )
