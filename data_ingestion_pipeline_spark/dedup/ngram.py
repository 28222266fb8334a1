"""n-gram Jaccard near-duplicate pairs — exact, via a shingle inverted index.

The naive near-dup check is O(n²) document pairs; the inverted index makes
it O(co-occurring pairs): explode distinct shingles → self-join on shingle →
count shared shingles per pair → Jaccard from |A|, |B|, |A∩B|. Random text
shares almost no 3-gram shingles, so the pair space stays sparse; for
adversarially common shingles (boilerplate), drop the hottest shingles first
(a standard df-cut) — exposed via ``max_shingle_df``.

This is the *exact* verifier; MinHash-LSH (dedup/minhash.py) is the
approximate candidate generator for scales where even the inverted index is
too hot. Jaccard here is bigint-count arithmetic → identical across engines
(oracle-checkable, unlike hash-seeded MinHash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.functions.text import shingles, tokens

__all__ = ["shingle_sets", "jaccard_pairs"]


def shingle_sets(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) distinct pairs + per-doc set sizes kept alongside."""
    tok = tokens(F.col(text_col))
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(shingles(tok, n))).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard) with Jaccard ≥ threshold.

    Plan: one explode + distinct (shuffle on shingle), one self-join on
    shingle (co-occurrence counts), one join back to set sizes. The
    ``max_shingle_df`` cut drops degenerate ubiquitous shingles before the
    self-join — the skew guard that keeps the hottest key from dominating a
    single reducer at scale.
    """
    sets = shingle_sets(df, text_col, id_col, n).cache()
    sizes = sets.groupBy(id_col).agg(F.count("*").alias("set_size"))

    filtered = sets
    if max_shingle_df is not None:
        hot = (
            sets.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        filtered = sets.join(hot, ["shingle"], "left_anti")

    a = filtered.select(F.col(id_col).alias("id_a"), "shingle")
    b = filtered.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, ["shingle"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(sz_a, ["id_a"]).join(sz_b, ["id_b"])
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
