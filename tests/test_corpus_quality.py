"""Gopher repetition rules + winnowing fingerprints: published-semantics
pins that the oracle comparison alone can't express (the match guarantee,
planted-pathology verdicts)."""

from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.operators.corpus_quality import (
    DUP5_MAX,
    TOP2_MAX,
    WINNOW_K,
    WINNOW_W,
    gopher_repetition_documents,
    winnowing_fingerprints_documents,
)
from tests.conftest import SF_SMOKE


def _run_on(spark, fn, rows):
    """Run an (spark, sf_dir) operator on an inline corpus by monkey-free
    substitution: write rows to a temp view-backed parquet dir."""
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="cq_")
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return fn(spark, d)


def test_gopher_flags_planted_repetition(spark):
    """A document that is one 2-gram repeated forever must fail the top-2-
    gram rule; a document of distinct tokens must pass all rules."""
    rows = [
        (1, " ".join(["spam ham"] * 30)),          # top2 share == 1.0
        (2, " ".join(f"tok{i}" for i in range(60))),  # all-distinct
        (3, " ".join(["a b c d e"] * 12)),          # every 5-gram repeats
    ]
    got = {r.doc_id: r for r in _run_on(spark, gopher_repetition_documents, rows).collect()}
    assert got[1].top2gram_frac >= TOP2_MAX and not got[1].keep
    assert got[2].keep and got[2].dup5gram_frac == 0.0
    assert got[3].dup5gram_frac >= DUP5_MAX and not got[3].keep


def test_winnowing_match_guarantee_and_density(spark):
    """Two documents sharing a run of >= w + k - 1 tokens must share at
    least one fingerprint hash; disjoint-vocabulary documents share none;
    density stays within the theoretical band (>= 1/w by pigeonhole)."""
    shared = " ".join(f"s{i}" for i in range(WINNOW_W + WINNOW_K - 1))
    rows = [
        (1, "x1 x2 x3 " + shared + " x4 x5 x6"),
        (2, "y1 y2 y3 y4 " + shared + " y5"),
        (3, " ".join(f"z{i}" for i in range(30))),
    ]
    out = _run_on(spark, winnowing_fingerprints_documents, rows)
    got = {r.doc_id: r for r in out.collect()}
    for r in got.values():
        assert r.n_fingerprints >= 1
        # every window picks one of w hashes → density >= 1/w, <= 1.0
        assert 1.0 / WINNOW_W <= r.density <= 1.0

    # the guarantee needs the raw fingerprint sets — recompute ranges:
    # min/max fp of docs 1 and 2 must overlap IF they share a fingerprint;
    # assert directly on the shared-run hash: both documents contain the
    # identical shared k-grams, and winnowing any full window inside the
    # shared run selects a shared hash. Check via set intersection of the
    # per-doc selected hash sets.
    from data_ingestion_pipeline_spark.operators.corpus_quality import _POS_BITS  # noqa: F401

    # rebuild fingerprint sets inline (same construction, hashes only)
    def fp_hashes(doc_text):
        toks = [t for t in doc_text.split() if t]
        import hashlib

        hs = []
        for i in range(len(toks) - WINNOW_K + 1):
            g = " ".join(toks[i : i + WINNOW_K])
            h = int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
            hs.append((h, i))
        sel = set()
        for i in range(len(hs) - WINNOW_W + 1):
            sel.add(min((h * (1 << 20) + p) for h, p in hs[i : i + WINNOW_W]))
        return {k // (1 << 20) for k in sel}

    s1, s2, s3 = (fp_hashes(r[1]) for r in rows)
    assert s1 & s2, "shared >= w+k-1 run must share a fingerprint"
    assert not (s1 & s3) and not (s2 & s3)
    # and the Spark-side counts agree with the inline reference
    assert got[1].n_fingerprints == len(fp_hashes(rows[0][1]))
    assert got[3].n_fingerprints == len(s3)


def test_gopher_on_fixture_is_mostly_keep(spark):
    """The synthetic fixture corpus is not pathological: the overwhelming
    majority of documents must pass the repetition rules."""
    out = gopher_repetition_documents(spark, SF_SMOKE)
    agg = out.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("keep"), 1)).alias("kept"),
    ).collect()[0]
    assert agg.kept >= 0.6 * agg.n


def test_winnowing_pairs_find_every_planted_copy(spark):
    """Every planted 80%-prefix copy (doc_id % 20 == 0 → +1000000) must be
    detected: the shared prefix is a run far longer than w + k - 1, so the
    winnowing guarantee makes the pair structurally unmissable."""
    from data_ingestion_pipeline_spark.operators.corpus_quality import (
        winnowing_near_copy_pairs_documents,
    )

    pairs = {
        (r.doc_a, r.doc_b)
        for r in winnowing_near_copy_pairs_documents(spark, SF_SMOKE).collect()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    planted = [
        r.doc_id
        for r in docs.filter(
            (F.col("doc_id") % 20 == 0)
            & (F.size(F.split(F.trim("text"), r"\s+")) >= 9)
        ).collect()
    ]
    assert planted, "fixture must contain planted sources"
    for d in planted:
        assert (d, d + 1000000) in pairs, f"planted pair for doc {d} missed"


def test_dsir_importance_separates_target_language(spark):
    """DSIR with an lang='en' target must score English documents higher
    on average than non-English ones — the selection property the method
    exists for. (The fixture's languages use distinct token vocabularies,
    so the hashed-unigram ratio separates them sharply.)"""
    from data_ingestion_pipeline_spark.operators.corpus_quality import (
        dsir_importance_documents,
    )

    scores = dsir_importance_documents(spark, SF_SMOKE)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "lang"
    )
    j = scores.join(docs, "doc_id").groupBy(F.col("lang") == "en").agg(
        F.avg(F.col("log_importance") / F.col("n_tokens")).alias("mean_per_tok")
    )
    got = {r[0]: r.mean_per_tok for r in j.collect()}
    assert got[True] > got[False], (
        f"target-language docs must score higher: {got}"
    )


def test_bpe_greedy_leftmost_overlap_semantics(spark):
    """The island/parity rewrite must implement greedy LEFTMOST
    non-overlapping merges — pinned against an inline reference on
    pathological repeat-runs ('aaaa' merging a|a → two merges, 'aaa' →
    one merge plus a trailing 'a')."""
    from data_ingestion_pipeline_spark.operators.bpe import (
        bpe_merges_documents,
    )

    rows = [
        (1, "aaaa aaaa aaaa"),   # dominant pair a|a, even run
        (2, "aaa aaa"),          # odd run: leftmost merge, trailing a
        (3, "xy xy xy"),         # runner-up pair
    ]
    out = _run_on(spark, bpe_merges_documents, rows)
    got = [(r.merge_rank, r.pair, r.pair_count) for r in out.orderBy("merge_rank").collect()]

    def model(words, n):
        seqs = {w: list(w) for w, _ in words}
        freq = dict(words)
        merges = []
        for it in range(n):
            pc = {}
            for w, s in seqs.items():
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + freq[w]
            if not pc:
                break
            best = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append((it + 1, best[0][0] + "|" + best[0][1], best[1]))
            a, b = best[0]
            for w, s in seqs.items():
                o, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        o.append(s[i] + s[i + 1])
                        i += 2
                    else:
                        o.append(s[i])
                        i += 1
                seqs[w] = o
        return merges

    words = [("aaaa", 3), ("aaa", 2), ("xy", 3)]
    assert got == model(words, 5)
