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
