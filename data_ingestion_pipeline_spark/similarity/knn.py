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

from data_ingestion_pipeline_spark.functions.partitioning import (
    block_grid_sides,
    fan_out,
)

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
    # full (directed) grid: every query block meets every neighbor block —
    # the shared replication step lives in functions/partitioning.py
    q, nb = block_grid_sides(
        fan_out(df), id_col, vec_col, n_blocks, triangular=False
    )

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
        # neighbor columns sorted by id so the stable argsort below breaks
        # 6-decimal score ties by nbr_id ASCENDING — the same order as the
        # global window (and the DuckDB oracle); an order-blind
        # argpartition could keep an arbitrary tied candidate locally and
        # drop the one the global rank would have chosen
        nb_order = np.argsort(inb, kind="stable")
        inb = inb[nb_order]
        mn = mn[nb_order]
        scores = np.round(
            (mq @ mn.T)
            / np.outer(np.linalg.norm(mq, axis=1), np.linalg.norm(mn, axis=1)),
            6,
        )
        # a row is never its own neighbor
        scores[iq[:, None] == inb[None, :]] = -np.inf
        kk = min(k, scores.shape[1])
        # local per-row top-k: stable sort on the rounded score keeps
        # id-ascending tie order (O(cols log cols) per row — block columns
        # are N/B, and the matmul above dominates regardless)
        part = np.argsort(-scores, axis=1, kind="stable")[:, :kk]
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
