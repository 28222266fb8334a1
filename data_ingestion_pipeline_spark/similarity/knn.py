"""Exact k-nearest-neighbor graph over an embedding column.

The batch form of similarity search: not "top-k for one query" (see
brute_force.topk_cosine) but "top-k neighbors for EVERY row" — the primitive
behind semantic dedup, retrieval-index bootstrapping, and diversity
sampling in a training-data pipeline.

Shape: the same blocked cogrouped-BLAS kernel as
``dedup/embedding.cosine_pairs_blas``, on the full B×B block grid (directed:
every query block meets every neighbor block). Each of the B² cogroups
scores its two blocks with ONE matmul and emits only each query row's local
top-k — O(N·B) shuffle rows in, O(N·B·k) candidate rows out, never the N²
pair relation. A final per-query window keeps the global top-k (the global
top-k is a subset of the union of per-block top-k's, so no candidate is
lost). At corpus scale, swap the exhaustive block grid for LSH/IVF
pre-bucketing (similarity/lsh.py, similarity/ivf.py) and keep the same
per-bucket matmul + final window.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.functions.partitioning import fan_out
from data_ingestion_pipeline_spark.functions.vector import as_double_array

__all__ = ["knn_graph"]


def knn_graph(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_blocks: int = 8,
) -> DataFrame:
    """(src_id, nbr_id, score, rnk) — each row's k nearest by cosine,
    rnk 1..k, ties on the 6-decimal score broken by nbr_id ascending (the
    rounding makes the ranking engine-independent; see cosine_pairs_blas)."""
    sides = fan_out(df).select(
        F.col(id_col).alias("_id"),
        as_double_array(F.col(vec_col)).alias("_v"),
    ).withColumn(
        "_blk", (F.crc32(F.col("_id").cast("string")) % n_blocks).cast("int")
    )
    grid = df.sparkSession.createDataFrame(
        [(x, y) for x in range(n_blocks) for y in range(n_blocks)],
        "bx int, by int",
    )

    def replicated(side: str, key: str) -> DataFrame:
        return (
            sides.alias(side)
            .join(
                F.broadcast(grid.alias(f"g_{side}")),
                F.col(f"{side}._blk") == F.col(f"g_{side}.{key}"),
            )
            .select(
                F.col(f"g_{side}.bx").alias("bx"),
                F.col(f"g_{side}.by").alias("by"),
                F.col(f"{side}._id").alias("_id"),
                F.col(f"{side}._v").alias("_v"),
            )
        )

    q = replicated("sq", "bx")
    nb = replicated("sn", "by")

    def score_block(key, left, right):
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {
                    "src_id": np.array([], dtype="int64"),
                    "nbr_id": np.array([], dtype="int64"),
                    "score": np.array([], dtype="float64"),
                }
            )
        iq = left["_id"].to_numpy()
        inb = right["_id"].to_numpy()
        mq = np.stack(left["_v"].to_numpy())
        mn = np.stack(right["_v"].to_numpy())
        scores = np.round(
            (mq @ mn.T)
            / np.outer(np.linalg.norm(mq, axis=1), np.linalg.norm(mn, axis=1)),
            6,
        )
        # a row is never its own neighbor
        scores[iq[:, None] == inb[None, :]] = -np.inf
        kk = min(k, scores.shape[1])
        # local per-row top-k (argpartition is O(cols), not a sort)
        part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(iq)), kk)
        cols = part.ravel()
        s = scores[rows, cols]
        keep = np.isfinite(s)
        return pd.DataFrame(
            {
                "src_id": iq[rows[keep]],
                "nbr_id": inb[cols[keep]],
                "score": s[keep],
            }
        )

    cands = (
        q.groupBy("bx", "by")
        .cogroup(nb.groupBy("bx", "by"))
        .applyInPandas(score_block, "src_id long, nbr_id long, score double")
    )
    w = Window.partitionBy("src_id").orderBy(
        F.col("score").desc(), F.col("nbr_id").asc()
    )
    return (
        cands.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("src_id", "nbr_id", "score", "rnk")
    )
