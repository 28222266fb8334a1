"""SimHash near-duplicate detection — constant-size signature per document.

Charikar's scheme: each token hashes to 64 bits; each bit position
accumulates +1/−1 across tokens; the sign pattern is the 64-bit signature.
Near-duplicates differ in few bits (small Hamming distance).

Implementation is aggregate-shaped, not UDF-shaped: explode tokens → 64
conditional-sum aggregates (one per bit) → assemble the signature with
shifts/ORs. The pair search uses the pigeonhole trick: signatures within
Hamming distance d must agree on at least one of d+1 disjoint chunks, so a
self-join on (chunk index, chunk value) finds all candidates with an
equi-join — no cross join, same shape LSH banding has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.functions.partitioning import fan_out
from data_ingestion_pipeline_spark.functions.text import tokens

__all__ = ["simhash_signatures", "simhash_near_dup_pairs"]

_BITS = 64
_CHUNKS = 4  # finds all pairs with hamming distance <= _CHUNKS - 1


def simhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, simhash long) per document."""
    # explode_outer + null-filter: a plain explode's inferred size()>0
    # filter would re-split the text below the fan_out exchange (see
    # dedup/ngram.jaccard_pairs).
    exploded = fan_out(df).select(
        F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok").isNotNull()).withColumn("h", F.xxhash64("tok"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(_BITS)
    ]
    sums = exploded.groupBy(id_col).agg(*bit_sums)
    sig = F.lit(0).cast("long")
    for i in range(_BITS):
        sig = sig.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sums.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """All pairs (a < b) with Hamming(simhash_a, simhash_b) ≤ max_hamming.

    Exact over the signature space (pigeonhole guarantees no candidate is
    missed for distance ≤ _CHUNKS−1); approximate over documents to the
    extent SimHash itself is.
    """
    assert max_hamming <= _CHUNKS - 1, "raise _CHUNKS for larger distances"
    sigs = simhash_signatures(df, text_col, id_col)
    chunk_bits = _BITS // _CHUNKS
    mask = (1 << chunk_bits) - 1
    chunks = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", j * chunk_bits).bitwiseAND(F.lit(mask))
                    for j in range(_CHUNKS)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a = chunks.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"), "chunk_idx", "chunk_val"
    )
    b = chunks.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"), "chunk_idx", "chunk_val"
    )
    return (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
