"""Semantics tests for the training-pipeline text operators (SURVEY-extra:
dedup / similarity / text analysis). Cross-engine equivalence with DuckDB is
covered by scripts/check_oracle.py + the driver's CORRECTNESS gate; these
pin the operator *semantics* on hand-built corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graven_spark.operators import textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (3, "completely different text about spark shuffles and joins"),
        (4, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = {r.canonical_doc_id: r.n_dups for r in textops.exact_dedup(docs).collect()}
    assert out[0] == 2  # docs 0 and 2 identical
    assert out[1] == 1 and out[3] == 1 and out[4] == 1


def test_ngram_jaccard_finds_near_dup(spark, docs):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in textops.ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    }
    assert (0, 2) in pairs and pairs[(0, 2)] == 1.0  # exact dup
    assert (0, 1) in pairs and 0.5 < pairs[(0, 1)] < 1.0  # near dup
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_minhash_lsh_catches_exact_and_near(spark, docs):
    cands = {
        (r.doc_a, r.doc_b)
        for r in textops.minhash_lsh_candidates(docs, n=3, k=16, bands=8).collect()
    }
    assert (0, 2) in cands  # identical docs always collide in every band
    assert (0, 3) not in cands


def test_simhash_similar_docs_close(spark, docs):
    h = {r.doc_id: r.simhash for r in textops.simhash(docs, bits=32).collect()}
    assert h[0] == h[2]  # identical text → identical simhash
    d01 = bin(h[0] ^ h[1]).count("1")
    d03 = bin(h[0] ^ h[3]).count("1")
    assert d01 < d03  # near-dup closer in hamming space than unrelated


def test_lang_id_stopword_ratio(spark, docs):
    out = {r.doc_id: r for r in textops.lang_id(docs).collect()}
    assert out[0].lang_pred == "en"  # the two 'the's hit the stopword list
    assert out[4].lang_pred == "other"
    assert abs(out[0].stopword_ratio - round(2 / 9, 6)) < 1e-6


def test_token_count(spark, docs):
    out = {r.doc_id: r for r in textops.token_count(docs).collect()}
    assert out[4].ws_tokens == 1 and out[4].re_tokens == 1
    assert out[0].ws_tokens == 9


def test_fingerprint_deterministic_and_dup_invariant(spark, docs):
    fp = {r.doc_id: r.fp for r in textops.fingerprint(docs).collect()}
    assert fp[0] == fp[2]
    assert fp[0] != fp[3]


def test_corpus_prepare_composed_gates(spark, docs):
    """Each gate prunes: exact dup (doc 2 folds into 0), non-en (doc 4 —
    no stopwords), embedding near-dup (doc 1 dropped, its lower twin 0
    kept); docs 0 and 3 survive with token counts."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 0 -> dropped
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 1.0, 0.0]),
            (4, [0.0, 0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r.doc_id: r for r in textops.corpus_prepare(
        docs, emb, dim=4, min_quality=0.0, near_dup_threshold=0.9, n_planes=2
    ).collect()}
    assert set(out) == {0, 3}
    assert out[0].ws_tokens == 9 and out[0].quality > 0
    assert out[3].ws_tokens == 8
