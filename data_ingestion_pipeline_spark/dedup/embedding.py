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

from data_ingestion_pipeline_spark.functions.partitioning import (
    block_grid_sides,
    fan_out,
)
from data_ingestion_pipeline_spark.functions.vector import as_double_array, cosine, dot, l2_norm
from data_ingestion_pipeline_spark.similarity.lsh import band_buckets

__all__ = ["cosine_pairs", "cosine_pairs_blas", "lsh_cosine_pairs"]


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    dim: int | None = None,
    n_blocks: int = 16,
) -> DataFrame:
    """Exact near-dup pairs: blocked self-join, score, threshold.

    All-pairs is inherently O(N²) in *scored pairs*, but not in join
    strategy: instead of a BroadcastNestedLoopJoin on ``id_a < id_b``
    (row-at-a-time loop, poor task parallelism), each vector gets a block
    id = hash(id) mod B and the join runs as two hash equi-joins through a
    broadcast table of the B·(B+1)/2 unordered block combinations. Same
    pair set after the ``id_a < id_b`` filter, but shuffle-partitioned
    across the cluster by block pair — measured ~3× over BNLJ locally and
    it scales out instead of serializing on the nested loop.

    Per-vector work is hoisted out of the pair loop: norms are computed
    once per vector; score = dot/(norm_a·norm_b) — identical operation
    order to dot/(√Σa²·√Σb²), so results are bitwise-unchanged. Pass
    ``dim`` to unroll the per-pair dot (per-pair volume dominates here, the
    one place the unrolled form pays; see functions/vector.py).

    Still quadratic — the scale path for big corpora is
    ``lsh_cosine_pairs``.
    """
    sides = fan_out(df).select(
        F.col(id_col).alias("_id"),
        as_double_array(F.col(vec_col)).alias("_v"),
    )
    sides = sides.select(
        "_id",
        "_v",
        l2_norm(F.col("_v"), dim).alias("_n"),
        (F.crc32(F.col("_id").cast("string")) % n_blocks).cast("int").alias("_blk"),
    )
    block_pairs = df.sparkSession.createDataFrame(
        [(x, y) for x in range(n_blocks) for y in range(n_blocks) if x <= y],
        "bx int, by int",
    )
    a = sides.select(
        F.col("_id").alias("id_a"),
        F.col("_v").alias("va"),
        F.col("_n").alias("na"),
        F.col("_blk").alias("bx"),
    )
    b = sides.select(
        F.col("_id").alias("id_b"),
        F.col("_v").alias("vb"),
        F.col("_n").alias("nb"),
        F.col("_blk").alias("by"),
    )
    # Pair coverage: for blocks x < y each unordered pair appears exactly
    # once (the a-side must hold the x-block member); for x == y the id
    # filter keeps one of the two arrangements. The a-side member is NOT
    # always the smaller id, so the output canonicalizes with
    # least/greatest — scores are symmetric.
    return (
        a.join(F.broadcast(block_pairs), ["bx"])
        .join(b, ["by"])
        .filter((F.col("bx") != F.col("by")) | (F.col("id_a") < F.col("id_b")))
        .select(
            F.least("id_a", "id_b").alias("lo"),
            F.greatest("id_a", "id_b").alias("hi"),
            F.round(
                dot(F.col("va"), F.col("vb"), dim) / (F.col("na") * F.col("nb")), 6
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
        .select(F.col("lo").alias("id_a"), F.col("hi").alias("id_b"), "score")
    )


def cosine_pairs_blas(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact near-dup pairs via cogrouped block matmul — the batch kernel
    form of ``cosine_pairs``.

    Same blocking scheme, different inner loop: instead of emitting every
    candidate pair as a row and evaluating an unrolled dot expression per
    pair (whose dim-term codegen tree costs seconds of compile time alone),
    each of the B·(B+1)/2 block combinations is cogrouped into ONE pandas
    call that stacks the two blocks into matrices and scores all pairs with
    a single BLAS matmul. Shuffle volume drops from O(pairs) rows carrying
    two vectors each to O(N·B) rows carrying one vector each, and only
    above-threshold pairs ever materialize as Spark rows.

    Scores are np.round(matmul/outer-norms, 6): summation order differs
    from the sequential fold, but both land on the same 6-decimal value
    (asserted against ``cosine_pairs`` in pytest) and the threshold sits in
    an empty score gap by corpus construction.
    """
    # triangular (undirected) grid — the shared replication step lives in
    # functions/partitioning.py
    a, b = block_grid_sides(df, id_col, vec_col, n_blocks, triangular=True)

    def score_block(key, left, right):
        import numpy as np
        import pandas as pd

        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {
                    "id_a": np.array([], dtype="int64"),
                    "id_b": np.array([], dtype="int64"),
                    "score": np.array([], dtype="float64"),
                }
            )
        bx, by = key
        ia = left["_id"].to_numpy()
        ib = right["_id"].to_numpy()
        ma = np.stack(left["_v"].to_numpy())
        mb = np.stack(right["_v"].to_numpy())
        scores = np.round(
            (ma @ mb.T)
            / np.outer(np.linalg.norm(ma, axis=1), np.linalg.norm(mb, axis=1)),
            6,
        )
        mask = scores >= threshold
        if bx == by:
            mask &= ia[:, None] < ib[None, :]
        r, c = np.nonzero(mask)
        return pd.DataFrame(
            {
                "id_a": np.minimum(ia[r], ib[c]),
                "id_b": np.maximum(ia[r], ib[c]),
                "score": scores[r, c],
            }
        )

    return (
        a.groupBy("bx", "by")
        .cogroup(b.groupBy("bx", "by"))
        .applyInPandas(score_block, "id_a long, id_b long, score double")
    )


def lsh_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    n_bands: int = 4,
    planes_per_band: int = 6,
    dim: int = 64,
) -> DataFrame:  # noqa: D417 — dim doubles as hyperplane width and unroll width
    """LSH-banded near-dup pairs: candidates collide in ≥1 band's bucket.

    Each band is an independent ``planes_per_band``-bit hyperplane bucketing;
    a pair at cosine θ collides in one band with p = (1 − θ/π)^bits, in ≥1 of
    B bands with 1 − (1−p)^B — the band count dials recall. Exact cosine is
    then computed only for candidates, and a distinct() collapses pairs that
    collide in several bands.
    """
    vecs = (
        fan_out(df)
        .select(
            F.col(id_col).alias("_id"),
            as_double_array(F.col(vec_col)).alias("_v"),
        )
        # three consumers (the banding kernel + both vector re-attach joins)
        # each replay the scan/augment/cast lineage un-pinned — materialize
        # the N×(id, dim doubles) relation once, like `banded` below
        # (eager, r12: the consumers race a lazy pin's materializing job
        # and recompute partitions — "Block already exists")
        .localCheckpoint()
    )
    # All band buckets in one Arrow-batched matmul (similarity/lsh.py::
    # band_buckets) — the expression form is O(B·planes·dim) codegen terms
    # and its compile time alone dominates at recall-complete band counts.
    # The banded table is materialized once (localCheckpoint): Spark plans
    # the self-join below as two copies of the subtree, so an un-pinned
    # banding would re-run the Python kernel per branch (measured 6 ArrowEval
    # nodes in the executed plan). The pinned form is N×(B longs) — the same
    # "persist the bucketed corpus" step a production pipeline does anyway.
    banded = vecs.select(
        "_id",
        band_buckets(F.col("_v"), dim, n_bands, planes_per_band).alias("_bkts"),
    ).localCheckpoint()
    # Candidates-first: only (id, band, bucket) flows through the banding
    # self-join — the collision volume is B × Σ bucket², and a collision row
    # is 3 longs, not two dim-wide vectors. Carrying vectors through this
    # join is the difference between a ~16-byte and a ~1 KB shuffle row; at
    # any scale the id-only form wins, and the vectors are joined back
    # exactly once per *distinct* candidate pair below.
    bands = banded.select(
        "_id", F.posexplode("_bkts").alias("band", "bucket")
    )

    left = bands.select("band", "bucket", F.col("_id").alias("id_a"))
    right = bands.select("band", "bucket", F.col("_id").alias("id_b"))
    candidates = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # One exact score per candidate pair (not per collision): two hash
    # equi-joins on id re-attach the vectors, then the unrolled dot runs
    # once. Both joins shuffle on the id key — no broadcast assumption, so
    # the same plan survives when N no longer fits an executor.
    scored = (
        candidates.join(
            vecs.select(F.col("_id").alias("id_a"), F.col("_v").alias("va")), "id_a"
        )
        .join(
            vecs.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb")), "id_b"
        )
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("score"),
        )
    )
    return scored.filter(F.col("score") >= threshold)
