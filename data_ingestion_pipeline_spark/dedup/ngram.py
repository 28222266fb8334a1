"""n-gram Jaccard near-duplicate pairs — exact, via a shingle inverted index.

The naive near-dup check is O(n²) document pairs; the inverted index makes
it O(co-occurring pairs): explode shingles → self-join on shingle → count
shared shingles per pair → Jaccard from |A|, |B|, |A∩B|. Three scale
decisions shape the plan:

- **Hashed shingles end to end.** Shingles are 8-byte xxhash64 values of
  the token windows (never materialized as strings, see ``shingle_sets``)
  — less CPU to build, less shuffle IO, faster compares. A cross-document
  collision would inflate one pair's overlap count with probability
  ~|A|·|B|/2⁶⁴ ≈ 1e-16 per pair — far below any operational concern (and
  deterministic for a given dataset).
- **Sizes ride along.** Set sizes are carried through the exploded rows and
  the groupBy key, so Jaccard needs no join back to a per-doc size table —
  one exchange fewer. The exploded relation is already distinct per
  (id, shingle) because shingle arrays are de-duplicated *before* the
  explode (array_distinct is a narrow op; a distinct() here would be a
  whole extra shuffle).
- **Size filter in the join.** J ≥ t forces t·|B| ≤ |A| ≤ |B|/t; pairs
  violating it are dropped inside the join before they reach the
  aggregation.

The two join sides are identical subplans, so Spark reuses one shuffle
exchange for both (ReusedExchange) — the index is shuffled once, not twice.
For adversarially hot shingles (boilerplate), ``max_shingle_df`` applies
the standard df-cut before the self-join; it bounds the worst key's fan-out
at the cost of ignoring ubiquitous shingles (off by default; Jaccard then
deviates from the brute-force definition, so leave it off when
oracle-checking). This is the *exact* verifier; MinHash-LSH
(dedup/minhash.py) is the approximate candidate generator for scales where
even the inverted index is too hot. Jaccard here is bigint-count
arithmetic → identical across engines.

For high thresholds (t ≳ 0.7, the usual dedup regime) the prefix-filtered
AllPairs join would beat plain counting — only the first
|S| − ⌈t·|S|⌉ + 1 shingles of each sorted set need indexing for exact
candidate generation. At t = 0.4 (this fixture's setting) the prefix is
60% of the set and the extra verify join costs more than it prunes —
measured, not guessed — so counting stays the default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.functions.partitioning import fan_out
from data_ingestion_pipeline_spark.functions.text import tokens

__all__ = ["shingle_sets", "jaccard_pairs", "containment_pairs"]


def shingle_sets(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """(id, distinct HASHED shingle array<long>, set size) per document —
    the set representation shared by the Jaccard join, MinHash, and their
    tests. Shingles are n-token windows hashed directly from the token
    columns (multi-arg xxhash64) — the n-gram *string* is never built,
    which halves the shingling cost and makes every downstream set op
    (distinct, join keys, array_intersect) long-typed instead of
    string-typed. Set membership is equivalent to string shingles: two
    windows hash equal iff their token tuples are equal (modulo 2⁻⁶⁴
    collisions; past-end positions hash as absent/NULL consistently on
    both sides of any comparison). Fans the (narrow) input out across
    cores first: shingling is the CPU-dense step and single-file fixtures
    otherwise pin it to one task."""
    df = fan_out(df)
    tok = tokens(F.col(text_col))
    # try_element_at, not element_at: a document shorter than n tokens
    # still emits its one partial window (past-end → NULL, skipped by
    # xxhash64) instead of INVALID_ARRAY_INDEX under ANSI mode
    win = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(F.col("_tok")) - (n - 1), F.lit(1))),
        lambda i: F.xxhash64(
            *[F.try_element_at(F.col("_tok"), i + j) for j in range(n)]
        ),
    )
    return (
        df.select(F.col(id_col), tok.alias("_tok"))
        .select(F.col(id_col), F.array_distinct(win).alias("sset"))
        .withColumn("set_size", F.size("sset"))
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """DIRECTED pairs (id_a, id_b, containment) with
    C(A→B) = |A∩B|/|A| ≥ threshold — Broder's asymmetric containment,
    which catches "A is a fragment of B" (prefix copies, quoted excerpts,
    chunk re-ingestion) that symmetric Jaccard dilutes: a 10%-of-B
    fragment has J ≈ 0.1 but C(A→B) ≈ 1. Same inverted-index equi-join
    shape as ``jaccard_pairs``; the size filter is one-sided
    (|A∩B| ≤ |B| ⇒ C ≥ t requires |B| ≥ t·|A|)."""
    # eager pin — same two-sided self-join as jaccard_pairs (r12)
    sets = shingle_sets(df, text_col, id_col, n).localCheckpoint()
    ex = sets.select(
        F.col(id_col), F.col("set_size"), F.explode_outer("sset").alias("sh")
    ).filter(F.col("sh").isNotNull())
    a = ex.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"), "sh")
    b = ex.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"), "sh")
    inter = (
        a.join(b, ["sh"])
        .filter(
            (F.col("id_a") != F.col("id_b"))
            & (F.col("size_b").cast("double") >= F.col("size_a") * threshold)
        )
        .groupBy("id_a", "id_b", "size_a")
        .agg(F.count("*").alias("n_common"))
    )
    c = F.col("n_common").cast("double") / F.col("size_a").cast("double")
    return inter.filter(c >= threshold).select(
        "id_a", "id_b", F.round(c, 6).alias("containment")
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard) with Jaccard ≥ threshold — exact."""
    # EAGER pin (r12): the inverted-index self-join below references the
    # shingle relation through BOTH sides (a and b project different
    # columns, so the exchanges don't dedupe) — unpinned, the CPU-dense
    # shingling transform ran twice per call; lazily pinned, the two sides
    # race the materializing job. One row per doc (arrays), tiny blocks.
    sets = shingle_sets(df, text_col, id_col, n).localCheckpoint()
    # explode_outer, not explode: Catalyst infers `size(sset) > 0` from a
    # plain explode and pushes it below the fan_out exchange into the scan,
    # re-evaluating the whole shingle transform single-threaded on the
    # un-fanned input (measured: ~7 s of the pipeline's 12 s at sf0.1).
    # explode_outer admits no such inference; the null row from an empty
    # set is dropped right here instead.
    ex = sets.select(
        F.col(id_col), F.col("set_size"), F.explode_outer("sset").alias("sh")
    ).filter(F.col("sh").isNotNull())

    if max_shingle_df is not None:
        hot = (
            ex.groupBy("sh")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("sh")
        )
        ex = ex.join(hot, ["sh"], "left_anti")

    a = ex.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"), "sh")
    b = ex.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"), "sh")
    inter = (
        a.join(b, ["sh"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("size_a") * threshold <= F.col("size_b"))
            & (F.col("size_b") * threshold <= F.col("size_a"))
        )
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count("*").alias("n_common"))
    )
    return inter.select(
        "id_a",
        "id_b",
        F.round(
            F.col("n_common").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double"),
            6,
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)
