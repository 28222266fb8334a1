"""Bloom-filter membership pruning for long-typed keys.

Spark uses Bloom filters internally (runtime row-group filtering,
``InjectRuntimeFilter``) but exposes no public ``bloom_filter_agg`` /
``might_contain`` SQL surface in this build, so the sketch is implemented
as the same kind of kernel the rest of the repo uses for wide hashing
(similarity/lsh.py::band_buckets): a driver-built bitset closed over an
Arrow-batched pandas UDF, k vectorized probes per batch.

Scale posture: the bitset is built from the SMALL side only (benchmark
suites, blocklists — the sides that are KBs-to-MBs by definition; building
collects just that side, same bounded-driver-state policy as IVF centroids
and PQ codebooks). The probe ships the bitset once per executor inside the
UDF closure and reduces the BIG side before any join — candidate volume ∝
true hits + FPR·corpus, not corpus.

Hashes: k independent 64-bit avalanche mixes (splitmix/murmur finalizer
constants) of the int64 key — deterministic, seed-derived, vectorized.
"""

from __future__ import annotations

import numpy as np

__all__ = ["bloom_build", "bloom_probe_udf", "bloom_params"]


def _mix64(x: np.ndarray, seed: int) -> np.ndarray:
    x = x.view(np.uint64) ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
    return x ^ (x >> np.uint64(33))


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) sized for ``n_items`` at false-positive rate ``fpp``."""
    n = max(n_items, 1)
    m = int(np.ceil(-n * np.log(fpp) / (np.log(2.0) ** 2)))
    k = max(1, int(round(m / n * np.log(2.0))))
    return m, k


def bloom_build(values, m_bits: int, k: int, seed: int = 0x5B10) -> np.ndarray:
    """uint64 bitset with ``values`` (int64 iterable) inserted k times."""
    bits = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    v = np.asarray(list(values), dtype=np.int64)
    if v.size == 0:
        return bits
    for j in range(k):
        h = _mix64(v, seed + j) % np.uint64(m_bits)
        np.bitwise_or.at(
            bits, (h >> np.uint64(6)).astype(np.int64), np.uint64(1) << (h & np.uint64(63))
        )
    return bits


def bloom_probe_udf(bits: np.ndarray, m_bits: int, k: int, seed: int = 0x5B10):
    """Column function: long key → boolean might-contain, one vectorized
    k-probe per Arrow batch."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _probe(s):
        # NULL keys: to_numpy(dtype=int64) raises on None/NaN — probe only
        # the non-null slots and report False (a NULL key is in no set)
        mask = s.notna().to_numpy()
        v = s.fillna(0).to_numpy(dtype=np.int64)
        ok = np.ones(len(v), dtype=bool)
        for j in range(k):
            h = _mix64(v, seed + j) % np.uint64(m_bits)
            word = bits[(h >> np.uint64(6)).astype(np.int64)]
            ok &= (word >> (h & np.uint64(63))) & np.uint64(1) != 0
        return pd.Series(ok & mask)

    _probe.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_probe, "boolean")
