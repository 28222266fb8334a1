"""Brute-force cosine similarity search — the exact baseline.

Single query: broadcast the query vector, one pass over the corpus with a
codegen'd cosine expression, global top-k. The scan parallelizes perfectly
(no shuffle until the final k-row ordering), so at 100 TB this is
bandwidth-bound — the right baseline to beat with the LSH variant.

Batch of queries: broadcast the (small) query set and crossJoin — each
corpus partition scores all queries locally; top-k per query via a ranking
window over the (still corpus-sized) scored relation. When the query set
stops fitting in a broadcast, that's the cue for the bucketed variant.

Kept as pure SQL expressions (functions/vector.py) rather than a pandas UDF:
the expression path is bit-reproducible across engines and avoids Arrow
transfer; a matrix-multiply pandas UDF wins only when scoring many queries
at once against each batch — noted as the escalation path, not the default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.functions.partitioning import fan_out
from data_ingestion_pipeline_spark.functions.vector import as_double_array, cosine

__all__ = [
    "topk_per_query","cosine_scores", "topk_cosine", "topk_cosine_batch"]


def cosine_scores(
    corpus: DataFrame,
    query_df: DataFrame,
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Score every corpus vector against every query row (query side must be
    broadcast-small). query_df: (query_id, qvec array). Pass ``dim`` when
    the embedding width is known — unrolled codegen vs interpreted fold.
    Double-casts are projected to bound columns before the join so the
    unrolled dot indexes attributes, not cast expressions."""
    corpus_d = fan_out(corpus).select(
        F.col(id_col), as_double_array(F.col("embedding")).alias("_v")
    )
    q = query_df.select("query_id", as_double_array(F.col("qvec")).alias("_qv"))
    return corpus_d.crossJoin(F.broadcast(q)).select(
        F.col("query_id"),
        F.col(id_col),
        cosine(F.col("_v"), F.col("_qv"), dim).alias("score"),
    )


def topk_cosine(
    corpus: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k for a single query: full scan + orderBy().limit(k) —
    Spark runs this as per-partition top-k then a k-row merge on the driver
    side of the exchange (TakeOrderedAndProject), not a global sort."""
    scored = cosine_scores(corpus, query_df, id_col, dim).drop("query_id")
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k).select(
        id_col, F.round("score", 6).alias("score")
    )


def topk_per_query(
    scored,
    k: int,
    id_col: str = "vec_id",
    score_col: str = "score",
    round_to: int | None = 6,
):
    """The shared ANN epilogue: rank = row_number over (score desc, id asc)
    per query_id, keep rank <= k, optionally round the published score.
    One tie-break and rounding policy for every ANN surface (IVF, IVF-PQ
    shortlist and refine) so variants that are recall-compared against
    each other can never diverge on ordering."""
    w = Window.partitionBy("query_id").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    ranked = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    if round_to is None:
        return ranked
    return ranked.select(
        "query_id",
        id_col,
        F.round(score_col, round_to).alias(score_col),
        "rank",
    )


def topk_cosine_batch(
    corpus: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Top-k per query for a broadcastable query batch, TWO-PHASE: a
    ranking window keyed by (input partition id, query) first cuts each
    scan partition to ≤k survivors per query, then the global per-query
    window ranks the ≤k·P survivors. One-phase ranking would concentrate
    the whole |corpus|×|Q| scored relation into |Q| partitions — and with
    a foldable-literal query_id Catalyst folds the partition key away
    entirely, silently degrading to ONE partition (observed on the PQ
    recall gate). ``spark_partition_id()`` is non-foldable, so neither
    degradation can happen; the two phases rank by the same total order
    (score desc, id asc), so the global top-k is exactly preserved."""
    scored = cosine_scores(corpus, query_df, id_col, dim)
    order = [F.col("score").desc(), F.col(id_col).asc()]
    local_w = Window.partitionBy(F.spark_partition_id(), "query_id").orderBy(
        *order
    )
    survivors = (
        scored.withColumn("_lrank", F.row_number().over(local_w))
        .filter(F.col("_lrank") <= k)
        .drop("_lrank")
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("score", 6).alias("score"), "rank")
    )
