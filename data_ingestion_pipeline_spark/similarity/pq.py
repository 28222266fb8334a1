"""Product quantization (PQ) for approximate nearest-neighbor search.

The missing third leg next to hyperplane-LSH (similarity/lsh.py) and IVF
(similarity/ivf.py): compress each vector into S sub-space code ids (one
byte-ish each) against per-subspace codebooks, then answer queries with
asymmetric distance computation (ADC) — the query stays full-precision, a
S×K table of subspace dot products is computed ONCE per query, and every
corpus vector scores as S table lookups instead of a dim-wide dot.

Scale shape:
- Training is a bounded driver-side k-means on a strided sample (same
  policy as IVF's `sample_centroids` — the "model" is S·K·(dim/S) doubles,
  plan-literal sized; at 100 TB you train on a fixed-size sample, never the
  corpus).
- Encoding is one numpy matmul per Arrow batch (mapInPandas) — the corpus
  is scanned once and carries S small ints afterwards; 64-dim floats
  (256 B) become 8 codes (8 B), a 32× memory/scan reduction, which is the
  entire point at corpus scale.
- ADC scoring is table lookups per Arrow batch; the per-query table is
  S×K doubles broadcast in the plan. Top-k via rank-limit.

Everything is deterministic: strided sample, fixed iteration count,
argmin-first-wins — so recall tests pin exact expectations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestion_pipeline_spark.functions.partitioning import fan_out
from data_ingestion_pipeline_spark.functions.vector import as_double_array

__all__ = ["train_codebooks", "lloyd_subspace_books", "pq_encode", "pq_topk"]


def train_codebooks(
    corpus: DataFrame,
    n_subspaces: int = 16,
    n_codes: int = 256,
    sample_size: int = 1024,
    n_iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Per-subspace codebooks via bounded driver-side Lloyd iterations.

    Deterministic: the sample is id-strided (spans the id range at any
    scale factor), initial centroids are the first K sample rows per
    subspace, and ties in assignment break first-wins (np.argmin). Returns
    a numpy array of shape (S, K, dim/S).
    """
    import numpy as np

    n = corpus.count()
    stride = max(n // sample_size, 1)
    rows = (
        corpus.filter(
            (F.col(id_col) % stride == 0) & (F.col(id_col) < stride * sample_size)
        )
        .select(F.col(id_col), as_double_array(F.col(vec_col)).alias("v"))
        .orderBy(id_col)
        .collect()
    )
    sample = np.array([list(r["v"]) for r in rows])
    return lloyd_subspace_books(sample, n_subspaces, n_codes, n_iters)


def lloyd_subspace_books(sample, n_subspaces: int, n_codes: int, n_iters: int):
    """Per-subspace Lloyd on an in-memory sample matrix (rows × dim).

    Factored out of ``train_codebooks`` so IVF-PQ can train on RESIDUAL
    samples (vector − coarse centroid) with the identical deterministic
    procedure: first-K init, fixed iterations, argmin-first-wins."""
    import numpy as np

    sample = np.asarray(sample, dtype=np.float64)
    if len(sample) < n_codes:
        # tiny corpora: cycle the sample so init still yields K centroids
        # (duplicate centroids are harmless — Lloyd leaves them in place)
        reps = -(-n_codes // len(sample))
        sample = np.tile(sample, (reps, 1))
    dim = sample.shape[1]
    assert dim % n_subspaces == 0, "dim must divide evenly into subspaces"
    sub = dim // n_subspaces
    books = np.empty((n_subspaces, n_codes, sub))
    for s in range(n_subspaces):
        x = sample[:, s * sub : (s + 1) * sub]
        cents = x[:n_codes].copy()
        for _ in range(n_iters):
            d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for kk in range(n_codes):
                members = x[assign == kk]
                if len(members):
                    cents[kk] = members.mean(axis=0)
        books[s] = cents
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — nearest codebook entry per subspace, one
    batched distance computation per Arrow batch."""
    import numpy as np
    import pandas as pd

    books = np.asarray(codebooks)
    n_subspaces, n_codes, sub = books.shape

    corpus_d = fan_out(corpus).select(
        F.col(id_col), as_double_array(F.col(vec_col)).alias("_v")
    )

    def encode(batches):
        for pdf in batches:
            x = np.stack(pdf["_v"].to_numpy())  # batch × dim
            codes = np.empty((len(x), n_subspaces), dtype=np.int32)
            for s in range(n_subspaces):
                xs = x[:, s * sub : (s + 1) * sub]
                # ||x - c||² argmin == (c·c - 2 x·c) argmin; one matmul
                d = (books[s] ** 2).sum(axis=1)[None, :] - 2.0 * (xs @ books[s].T)
                codes[:, s] = d.argmin(axis=1)
            out = pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})
            yield out

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )
    return corpus_d.mapInPandas(encode, schema)


def pq_topk(
    encoded: DataFrame,
    query_vec,
    codebooks,
    k: int = 20,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k: (id, approx_score) for the k corpus codes with the
    highest asymmetric inner-product against the full-precision query.

    The S×K lookup table (subspace dots of the query against every code)
    is computed once driver-side and closed over — bytes, not a join. Each
    corpus row costs S integer lookups + adds."""
    import numpy as np
    import pandas as pd

    books = np.asarray(codebooks)
    q = np.asarray(list(query_vec), dtype=np.float64)
    n_subspaces, n_codes, sub = books.shape
    table = np.stack(
        [books[s] @ q[s * sub : (s + 1) * sub] for s in range(n_subspaces)]
    )  # S × K

    def score(batches):
        for pdf in batches:
            codes = np.stack(pdf["codes"].to_numpy())  # batch × S
            scores = table[np.arange(n_subspaces)[None, :], codes].sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "approx_score": scores})

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("approx_score", T.DoubleType()),
        ]
    )
    scored = encoded.mapInPandas(score, schema)
    return (
        scored.orderBy(F.desc("approx_score"), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("approx_score", 6).alias("approx_score"))
    )
