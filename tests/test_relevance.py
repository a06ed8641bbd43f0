"""Keyword-relevance (BM25-shaped) top-k search tests."""

from __future__ import annotations

import pytest

from nifi_tekst_bundle_spark.operators import relevance
from nifi_tekst_bundle_spark.operators.relevance import B, K1


def _score_one_term(tf, dl, n, tl, df):
    """Reference scorer mirroring the pinned evaluation order."""
    avglen = tl / n
    norm = K1 * ((1.0 - B) + (B * dl) / avglen)
    idf = (n - df + 0.5) / (df + 0.5)
    return ((idf * tf) * (K1 + 1.0)) / (tf + norm)


def test_keyword_topk_hand_computed(spark):
    """Corpus of 3 docs, query 'zebra': doc 1 is the only match; its score
    equals the hand-evaluated BM25-shaped formula."""
    docs = spark.createDataFrame(
        [
            (1, "common common zebra"),
            (2, "common filler"),
            (3, "common filler words here"),
            (4, None),
        ],
        ["doc_id", "text"],
    )
    out = relevance.keyword_topk(docs, "doc_id", "text", ["zebra"], k=5)
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [1]
    # N=3 (null excluded), tl = 3+2+4 = 9, df(zebra)=1, tf=1, dl=3
    expected = _score_one_term(tf=1, dl=3, n=3, tl=9, df=1)
    assert rows[0]["score"] == pytest.approx(expected, abs=1e-6)


def test_keyword_topk_rare_term_outranks_common(spark):
    """A doc matching the rare term must outrank a doc matching only the
    corpus-wide term, and multi-term matches sum."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta"),        # rare alpha + common beta
            (2, "beta beta beta"),    # common only
            (3, "beta gamma"),
            (4, "gamma gamma"),
        ],
        ["doc_id", "text"],
    )
    out = relevance.keyword_topk(
        docs, "doc_id", "text", ["alpha", "beta"], k=4
    ).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] == 1  # alpha (df=1) dominates
    assert set(ids) == {1, 2, 3}  # doc 4 matches neither term


def test_keyword_topk_ties_break_on_id(spark):
    """Identical docs score identically; order falls back to ascending id."""
    docs = spark.createDataFrame(
        [(3, "same text"), (1, "same text"), (2, "same text")],
        ["doc_id", "text"],
    )
    out = relevance.keyword_topk(docs, "doc_id", "text", ["same"], k=3)
    assert [r["doc_id"] for r in out.collect()] == [1, 2, 3]


def test_keyword_topk_empty_terms_raises(spark):
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        relevance.keyword_topk(docs, "doc_id", "text", [])


def test_keyword_topk_plan_no_corpus_shuffle(spark):
    """Plan pin: top-k is TakeOrderedAndProject (no global Sort+Exchange of
    the corpus) and the stats side arrives via BroadcastExchange."""
    docs = spark.createDataFrame(
        [(i, f"w{i} vector") for i in range(50)], ["doc_id", "text"]
    )
    out = relevance.keyword_topk(docs, "doc_id", "text", ["vector"], k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan


def test_idf_modes_agree_on_single_term_ranking(spark):
    """ln is monotone per term, so single-term rankings (and the matched
    doc set) are identical across modes; only scores differ."""
    docs = spark.createDataFrame(
        [(i, ("target " * (i % 4 + 1)) + "filler pad") for i in range(30)],
        "doc_id long, text string",
    )
    a = relevance.keyword_topk(
        docs, "doc_id", "text", ["target"], k=10, idf_mode="oracle"
    ).collect()
    b = relevance.keyword_topk(
        docs, "doc_id", "text", ["target"], k=10, idf_mode="production"
    ).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert all(x["score"] != y["score"] for x, y in zip(a, b))


def test_bad_idf_mode_raises(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="idf_mode"):
        relevance.keyword_topk(docs, "doc_id", "text", ["x"], idf_mode="bm25")
