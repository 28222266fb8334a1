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
