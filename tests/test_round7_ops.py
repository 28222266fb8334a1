"""Round-7 operators: exact-substring span excision (Lee et al. shape),
corpus-wide BPE encoding, and the round-7 statistics tier."""

from __future__ import annotations

import hashlib

import pytest

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# exact_substring_excision — first-occurrence-wins span removal
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def excised(spark):
    from data_ingestion_pipeline_spark.operators.llm_data import (
        exact_substring_excision,
    )

    a = "a b c d e f g h x y z"  # 11 tokens, the span source
    rows = [
        (1, a),
        # novel 8-token prefix + doc 1's first 8 tokens copied verbatim
        (2, "p q r s t u v w a b c d e f g h"),
        (3, a),  # exact copy — must excise to nothing
        (4, "only five short tokens here"),  # <8 tokens, unique, intact
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in exact_substring_excision(df).collect()}


def test_excision_first_occurrence_intact(excised):
    r = excised[1]
    assert r.n_excised == 0
    assert r.kept_frac == 1.0
    assert r.rewritten_md5 == hashlib.md5(b"a b c d e f g h x y z").hexdigest()


def test_excision_removes_copied_span_only(excised):
    # doc 2: the copied 8-token suffix goes, the novel prefix stays
    r = excised[2]
    assert r.n_tokens == 16
    assert r.n_excised == 8
    assert r.rewritten_md5 == hashlib.md5(b"p q r s t u v w").hexdigest()


def test_excision_exact_copy_removed_entirely(excised):
    r = excised[3]
    assert r.n_excised == r.n_tokens == 11
    assert r.kept_frac == 0.0
    assert r.rewritten_md5 == hashlib.md5(b"").hexdigest()


def test_excision_short_unique_doc_intact(excised):
    r = excised[4]
    assert r.n_excised == 0
    assert r.rewritten_md5 == hashlib.md5(b"only five short tokens here").hexdigest()


# ---------------------------------------------------------------------------
# BPE corpus encode — parity vs a pure-python reference encoder
# ---------------------------------------------------------------------------


def _py_bpe(word_freq: dict, n_merges: int):
    """Reference BPE: greedy most-frequent pair (ties by (a, b) text asc),
    greedy-leftmost non-overlapping application — Sennrich et al. 2016."""
    seqs = {w: list(w) for w in word_freq}
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + word_freq[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((a, b, cnt))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


# ---------------------------------------------------------------------------
# LM corpus statistics tier
# ---------------------------------------------------------------------------


def test_good_turing_hand_computed(spark):
    from data_ingestion_pipeline_spark.operators import lm_stats

    # corpus: trigram "a b c" ×2 (via two docs), all other trigrams unique
    rows = [(1, "a b c d e"), (2, "a b c x y")]
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") t(doc_id, text)"
    )
    got = con.execute(
        lm_stats.GOOD_TURING_UNSEEN_MASS_DOCUMENTS_ORACLE
    ).fetchall()
    # trigrams: doc1 {abc, bcd, cde}, doc2 {abc, bcx, cxy} → abc:2, four r=1
    by_r = {r[0]: r for r in got}
    assert by_r[1][1] == 4 and by_r[2][1] == 1
    # r* for r=1: (1+1)·N2/N1 = 2·1/4 = 0.5 ; p0 = N1/N = 4/6
    assert by_r[1][2] == 0.5
    assert abs(by_r[1][3] - round(4 / 6, 6)) < 1e-9
    # Spark side agrees with the oracle on the same fixture via the
    # registered sweep (tri-SF); here pin the formula itself.


def test_mattr_bounds_and_degenerate_docs(spark):
    from data_ingestion_pipeline_spark.operators.lm_stats import (
        mattr_lexical_diversity_documents,
    )
    from data_ingestion_pipeline_spark.sources.catalog import load_table  # noqa: F401

    rows = [
        (1, " ".join(["same"] * 80)),  # zero diversity
        (2, " ".join(f"w{i}" for i in range(80))),  # all distinct
        (3, "a b a b"),  # short doc: plain TTR = 0.5
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # exercise the core expression by monkey-free direct call on a frame
    import data_ingestion_pipeline_spark.operators.lm_stats as M
    from unittest import mock

    with mock.patch.object(M, "load_table", lambda s, d, t: df):
        out = {r.doc_id: r for r in
               mattr_lexical_diversity_documents(spark, "unused").collect()}
    assert out[1].mattr == round(1 / 50, 6)
    assert out[2].mattr == 1.0
    assert out[3].mattr == 0.5 and out[3].ttr == 0.5


def test_negative_sampling_distribution_properties(spark):
    from data_ingestion_pipeline_spark.operators.lm_stats import (
        negative_sampling_table_documents,
    )

    out = negative_sampling_table_documents(spark, SF_SMOKE).collect()
    assert len(out) > 0
    # ranks are 1..n in count order; cum_p monotone; probabilities positive
    ranks = [r.rank for r in sorted(out, key=lambda r: r.rank)]
    assert ranks == list(range(1, len(out) + 1))
    cps = [r.cum_p for r in sorted(out, key=lambda r: r.rank)]
    assert all(b >= a for a, b in zip(cps, cps[1:]))
    # full-vocab normalizer: if every token is published, cum_p ≈ 1
    assert abs(cps[-1] - 1.0) < 1e-4


def test_skipgram_pairs_symmetric_and_thresholded(spark):
    from data_ingestion_pipeline_spark.operators.lm_stats import (
        skipgram_pmi_documents,
    )

    out = skipgram_pmi_documents(spark, SF_SMOKE).collect()
    assert 0 < len(out) <= 100
    for r in out:
        assert r.a <= r.b  # unordered normalization
        assert r.c_ab >= 5


def test_canonical_entities_duplicate_collapse(spark):
    """Identical (size, name) parts must land in one entity even with no
    fuzzy neighbor, and the fuzzy edge must still bridge distinct names —
    the distinct-name-collapse plan preserves part-level CC semantics."""
    from unittest import mock

    import data_ingestion_pipeline_spark.operators.analytics_checks as A

    rows = [
        (1, "alpha widget", 5),
        (2, "alpha widget", 5),  # exact dup of 1 — pair at distance 0
        (3, "alpha widgez", 5),  # distance 1 from "alpha widget"
        (4, "unrelated name", 5),  # singleton, no pair → excluded
        (5, "alpha widget", 9),  # same name, DIFFERENT size → not linked
    ]
    df = spark.createDataFrame(rows, "p_partkey long, p_name string, p_size int")
    with mock.patch.object(A, "load_table", lambda s, d, t: df):
        out = {r.p_partkey: r for r in
               A.canonical_entities_parts(spark, "unused").collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].entity_id == out[2].entity_id == out[3].entity_id == 1
    assert out[1].entity_size == 3
    assert out[1].is_canonical and not out[2].is_canonical


def test_bpe_encode_matches_python_reference(spark):
    from pyspark.sql import functions as F

    from data_ingestion_pipeline_spark.operators.bpe import _train

    corpus = [
        "low low low lower lowest",
        "new newer newest news",
        "wide wider widest low new",
        "aaaa aaa aa a",  # overlapping-run greedy-leftmost stress
    ]
    freq: dict = {}
    for line in corpus:
        for w in line.split():
            freq[w] = freq.get(w, 0) + 1
    ref_merges, ref_seqs = _py_bpe(freq, 5)

    wf = spark.createDataFrame(list(freq.items()), "word string, w long")
    merges, seq = _train(wf)
    assert [(a, b) for a, b, _ in ref_merges] == [
        tuple(p.split("|")) for _, p, _ in merges
    ]
    assert [c for _, _, c in ref_merges] == [c for _, _, c in merges]
    got = {
        r.word: r.n_sym
        for r in seq.groupBy("word").agg(F.count("*").alias("n_sym")).collect()
    }
    want = {w: len(s) for w, s in ref_seqs.items()}
    assert got == want
