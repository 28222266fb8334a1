"""IVF-PQ (IVF-ADC) approximate nearest neighbors — the composed index the
three standalone legs (LSH, IVF-Flat, PQ) build toward: coarse IVF cells
prune the candidate set, and product-quantized RESIDUALS (vector − cell
centroid) answer with asymmetric distance inside the probed cells only.
This is the standard billion-scale layout (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011; the FAISS IVFADC
default): candidate count ~N·nprobe/C, per-candidate cost S table lookups,
corpus storage one int list id + S small codes per vector.

Scale shape (same policies as similarity/ivf.py and similarity/pq.py):
- Coarse centroids: deterministic strided sample (C·dim doubles, driver-
  bounded). Residual codebooks: bounded driver-side Lloyd on the strided
  sample's residuals — the "model" is C·dim + S·K·(dim/S) doubles.
- Index build is ONE mapInPandas pass: per Arrow batch, a numpy matmul
  assigns cells, a subtraction forms residuals, a per-subspace matmul
  encodes them. The corpus is scanned once; no shuffle.
- Queries probe their nprobe nearest cells; each (query, cell) probe row
  carries the per-QUERY S×K ADC table (q against the residual codebooks —
  cell-independent for inner product) plus the per-cell q·centroid offset,
  through a broadcast equi-join on list_id — never a cross join. In
  production the encoded corpus is written partitioned by list_id, so the
  probe join is partition-pruned I/O.
- Approximate score = q·centroid(cell) + Σ_s table[s][code_s]
  = q·c + q·r̂ — the exact decomposition of q·v̂ with v̂ = centroid +
  quantized residual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestion_pipeline_spark.functions.partitioning import fan_out
from data_ingestion_pipeline_spark.functions.vector import as_double_array
from data_ingestion_pipeline_spark.similarity.brute_force import topk_per_query
from data_ingestion_pipeline_spark.similarity.ivf import (
    select_probe_cells,
    strided_sample_rows,
)
from data_ingestion_pipeline_spark.similarity.pq import lloyd_subspace_books

__all__ = ["train_ivfpq", "ivfpq_encode", "ivfpq_topk"]


def train_ivfpq(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_subspaces: int = 16,
    n_codes: int = 256,
    sample_size: int = 1024,
    n_iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """(centroids C×dim, residual codebooks S×K×(dim/S)) — both from the
    same deterministic strided sample; residuals subtract each sample
    vector's nearest centroid (argmax dot, matching the index assignment
    below) before the per-subspace Lloyd."""
    import numpy as np

    # one corpus count shared by both strided samples (centroids + the
    # residual training rows) — this used to pay two full count scans
    crows, n = strided_sample_rows(corpus, n_centroids, id_col, vec_col)
    cents = np.asarray([list(r["v"]) for r in crows])
    rows, _ = strided_sample_rows(corpus, sample_size, id_col, vec_col, n=n)
    sample = np.array([list(r["v"]) for r in rows])
    assign = (sample @ cents.T).argmax(axis=1)
    residuals = sample - cents[assign]
    books = lloyd_subspace_books(residuals, n_subspaces, n_codes, n_iters)
    return cents, books


def ivfpq_encode(
    corpus: DataFrame,
    centroids,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, list_id, codes array<int>) in ONE corpus pass: cell assignment
    (argmax dot — np.argmax first-wins, identical to ivf._assign_batched),
    residual subtraction, and per-subspace residual encoding, all numpy per
    Arrow batch."""
    import numpy as np
    import pandas as pd

    cents = np.asarray(centroids)
    books = np.asarray(codebooks)
    n_subspaces, n_codes, sub = books.shape

    corpus_d = fan_out(corpus).select(
        F.col(id_col), as_double_array(F.col(vec_col)).alias("_v")
    )

    def encode(batches):
        for pdf in batches:
            x = np.stack(pdf["_v"].to_numpy())  # batch × dim
            lists = (x @ cents.T).argmax(axis=1)
            r = x - cents[lists]
            codes = np.empty((len(x), n_subspaces), dtype=np.int32)
            for s in range(n_subspaces):
                rs = r[:, s * sub : (s + 1) * sub]
                d = (books[s] ** 2).sum(axis=1)[None, :] - 2.0 * (rs @ books[s].T)
                codes[:, s] = d.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "list_id": lists.astype("int32"),
                    "codes": list(codes),
                }
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("list_id", T.IntegerType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )
    return corpus_d.mapInPandas(encode, schema)


def ivfpq_topk(
    corpus: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_subspaces: int = 16,
    n_codes: int = 256,
    rerank: int = 100,
    id_col: str = "vec_id",
    model=None,
) -> DataFrame:
    """Approximate top-k per query over the probed cells only, with an
    exact refine step (the FAISS ``IVFPQR``/refine pipeline): ADC ranks a
    shortlist of ``rerank`` candidates per query, and only those re-score
    against their full-precision vectors. On near-uniform corpora the true
    neighbors' cosine margins are smaller than PQ quantization noise, so
    ADC-only ranking collapses as the candidate pool grows — the refine
    step restores recall to the IVF cell ceiling at a bounded extra cost
    of queries · rerank exact dots.

    query_df: (query_id, qvec), few by contract. Driver-side per query:
    pick the nprobe highest-dot cells, and per (query, cell) flatten the
    residual ADC table (S·K doubles) plus the q·centroid offset into one
    broadcast probe row. Executors join probes to the encoded corpus on
    list_id and score each candidate with S vectorized gathers."""
    import numpy as np
    import pandas as pd

    cents, books = model if model is not None else train_ivfpq(
        corpus, n_centroids, n_subspaces, n_codes, id_col=id_col
    )
    n_sub, n_k, sub = books.shape
    encoded = ivfpq_encode(corpus, cents, books, id_col=id_col)

    spark = corpus.sparkSession
    qrows = query_df.select(
        "query_id", as_double_array(F.col("qvec")).alias("_qv")
    ).collect()
    probe_rows = []
    for r in qrows:
        qv = np.asarray(r["_qv"], dtype="float64")
        s = cents @ qv
        # ADC table for inner product: q·v̂ = q·c + q·r̂, so the lookup
        # table is q against the residual codebooks — the FULL query, not
        # the residual query (the residual-query form is the L2-ADC
        # identity; used here it scores q·c + (q−c)·r̂, an extra −c·r̂
        # bias that varies per candidate and distorts the shortlist).
        # Cell-independent, so ONE table per query serves every probe.
        table = np.stack(
            [books[j] @ qv[j * sub : (j + 1) * sub] for j in range(n_sub)]
        )  # S × K
        flat = [float(x) for x in table.ravel()]
        for li in select_probe_cells(cents, qv, nprobe):
            probe_rows.append(
                (li, int(r["query_id"]), float(s[li]), flat)
            )
    probes = spark.createDataFrame(
        probe_rows,
        "list_id int, query_id long, q_dot_c double, adc_table array<double>",
    )

    joined = encoded.join(F.broadcast(probes), ["list_id"])

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy())  # B × S
            tables = np.stack(pdf["adc_table"].to_numpy()).reshape(
                len(pdf), n_sub, n_k
            )
            lut = np.take_along_axis(tables, codes[:, :, None], axis=2)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    id_col: pdf[id_col],
                    "approx_score": pdf["q_dot_c"].to_numpy()
                    + lut[:, :, 0].sum(axis=1),
                }
            )

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField(id_col, T.LongType()),
            T.StructField("approx_score", T.DoubleType()),
        ]
    )
    scored = joined.mapInPandas(score, schema)
    shortlist = topk_per_query(
        scored, rerank, id_col, score_col="approx_score", round_to=None
    ).select("query_id", id_col)
    # exact refine: the shortlist (queries·rerank rows) broadcasts into the
    # corpus scan; only shortlisted vectors pay a full-precision cosine
    from data_ingestion_pipeline_spark.functions.vector import cosine

    qv_df = query_df.select(
        "query_id", as_double_array(F.col("qvec")).alias("_qv")
    )
    exact = (
        corpus.select(F.col(id_col), as_double_array(F.col("embedding")).alias("_v"))
        .join(F.broadcast(shortlist), [id_col])
        .join(F.broadcast(qv_df), ["query_id"])
        .select(
            "query_id",
            id_col,
            cosine(F.col("_v"), F.col("_qv")).alias("score"),
        )
    )
    return topk_per_query(exact, k, id_col)
