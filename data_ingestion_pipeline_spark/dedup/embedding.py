"""Embedding-cosine near-duplicate detection over ``array<float>`` columns.

Semantic dedup: two documents are near-duplicates when their embeddings'
cosine similarity crosses a threshold. Two paths:

- ``cosine_pairs`` — exact all-pairs self-join. O(N²) candidate space; the
  correctness baseline and the DuckDB-oracle-checkable variant. Only viable
  when one side is broadcast-small (or as ground truth at test scale).
- ``lsh_cosine_pairs`` — hyperplane-LSH bucketed: candidates are pairs that
  collide in at least one of B independent bucketings (fewer planes per
  band → bigger buckets → higher recall). Candidate generation becomes a
  self-equi-join on (band, bucket) — shuffle on a compact key instead of a
  cross join, the same banding trick MinHash-LSH uses for Jaccard. This is
  the 100 TB path: candidate count scales with bucket occupancy, not N².

Both emit (id_a, id_b, score) with id_a < id_b, score rounded to 6 so the
threshold boundary is decided identically by every engine (the cosine fold
itself is bit-reproducible, see functions/vector.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.functions.vector import as_double_array, cosine
from data_ingestion_pipeline_spark.similarity.lsh import bucket_expr, hyperplanes

__all__ = ["cosine_pairs", "lsh_cosine_pairs"]


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
) -> DataFrame:
    """Exact near-dup pairs: self-join, score, threshold.

    The id_a < id_b predicate halves the candidate space and canonicalizes
    pair order. Catalyst broadcasts the smaller side at test scale; at
    production scale prefer ``lsh_cosine_pairs``.
    """
    a = df.select(F.col(id_col).alias("id_a"), as_double_array(F.col(vec_col)).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), as_double_array(F.col(vec_col)).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("score"))
        .filter(F.col("score") >= threshold)
    )


def lsh_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    n_bands: int = 4,
    planes_per_band: int = 6,
    dim: int = 64,
) -> DataFrame:
    """LSH-banded near-dup pairs: candidates collide in ≥1 band's bucket.

    Each band is an independent ``planes_per_band``-bit hyperplane bucketing;
    a pair at cosine θ collides in one band with p = (1 − θ/π)^bits, in ≥1 of
    B bands with 1 − (1−p)^B — the band count dials recall. Exact cosine is
    then computed only for candidates, and a distinct() collapses pairs that
    collide in several bands.
    """
    vec = as_double_array(F.col(vec_col))
    banded = df.select(
        F.col(id_col).alias("_id"),
        vec.alias("_v"),
        *[
            bucket_expr(vec, hyperplanes(dim, planes_per_band, seed=971 + band)).alias(
                f"b{band}"
            )
            for band in range(n_bands)
        ],
    )
    bands = banded.select(
        "_id",
        "_v",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(band).alias("band"), F.col(f"b{band}").alias("bucket"))
                    for band in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "_v", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    left = bands.select(
        "band", "bucket", F.col("_id").alias("id_a"), F.col("_v").alias("va")
    )
    right = bands.select(
        "band", "bucket", F.col("_id").alias("id_b"), F.col("_v").alias("vb")
    )
    candidates = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .dropDuplicates(["id_a", "id_b"])
    )
    return candidates.select(
        "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("score")
    ).filter(F.col("score") >= threshold)
