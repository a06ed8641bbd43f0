"""Dedup + similarity operator tests over the driver-provided testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_tekst_bundle_spark.operators import dedup, multimodal, similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    # unpersist on teardown: a lingering cached relation would be
    # cache-substituted into later plans (breaking the column-pruning
    # assertions in test_plan_quality.py)
    df = spark.read.parquet(f"{SF}/documents.parquet").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def embs(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    yield df
    df.unpersist()


def test_exact_dedup(spark, docs):
    out = dedup.exact_dedup(docs, "doc_id", "text")
    n_docs = docs.count()
    assert out.count() <= n_docs
    assert out.agg(F.sum("dup_count")).first()[0] == n_docs


def test_minhash_identical_texts_are_candidates(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "completely different words about spark shuffles and buckets here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = dedup.minhash_near_dups(df, "doc_id", "text", jaccard_threshold=0.9)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_minhash_runs_on_corpus(spark, docs):
    pairs = dedup.minhash_near_dups(
        docs.limit(200), "doc_id", "text", jaccard_threshold=0.5
    )
    # just exercises the full plan; dup pairs may or may not exist
    assert pairs.count() >= 0


def test_simhash_near_dups(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "one two three four five six seven eight"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sim = dedup.simhash64(df, "doc_id", "text").collect()
    assert len({r["simhash"] for r in sim}) >= 2
    cands = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_near_dups(df, "doc_id", "text").collect()
    }
    assert (1, 2) in cands


def test_brute_force_topk_self_is_best(spark, embs):
    queries = embs.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity.brute_force_topk(embs, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) == 5
        best = min(rows, key=lambda r: r["rank"])
        assert best["vec_id"] == qid  # self-similarity = 1.0 tops the list
        assert abs(best["cos"] - 1.0) < 1e-4


def test_lsh_topk_contains_self(spark, embs):
    queries = embs.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity.lsh_topk(embs, queries, k=5, n_planes=6).collect()
    for qid in [r["query_id"] for r in out]:
        hits = [r for r in out if r["query_id"] == qid]
        assert any(r["vec_id"] == qid for r in hits)


def test_embedding_near_dups(spark, embs):
    pairs = dedup.embedding_near_dups(
        embs.limit(100), "vec_id", "embedding", threshold=0.5, n_planes=4
    )
    for r in pairs.limit(5).collect():
        assert r["id_a"] < r["id_b"]
        assert r["cos"] >= 0.5


def test_dedup_clusters_components(spark):
    """Min-label connected components over a pair graph: a 4-node chain
    (needs multi-round propagation), two separate 2-node components, and
    a duplicate edge in both directions."""
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "id_a long, id_b long",
    )
    out = {r["node"]: r["label"] for r in dedup.dedup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_banded_embedding_near_dups(spark):
    """Multi-table OR amplification: pair recall ⊇ any single table's, the
    bucket cap's kept/dropped accounting is surfaced (no silent
    truncation), and pair output is ordered + thresholded."""
    from pyspark.sql import functions as F

    embs = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    stats: dict = {}
    pairs = dedup.embedding_near_dups_banded(
        embs, "vec_id", "embedding", threshold=0.2,
        n_tables=2, planes_per_table=6, bucket_cap=12, stats=stats,
    ).collect()
    assert stats["kept_buckets"] > 0
    assert stats["dropped_buckets"] > 0  # cap path genuinely exercised
    seen = set()
    for r in pairs:
        assert r["id_a"] < r["id_b"]
        assert r["cos"] >= 0.2
        assert (r["id_a"], r["id_b"]) not in seen  # deduped across tables
        seen.add((r["id_a"], r["id_b"]))


def test_multimodal_stub_plumbing(spark):
    rows = [
        (1, "image", bytearray(b"\x89PNGfake"), {"src": "a"}),
        (2, "video", bytearray(b"RIFFfake"), {"src": "b"}),
        (3, "image", None, None),
    ]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    feats = multimodal.extract_features(df, decode_stub=True).collect()
    assert len(feats) == 3
    byid = {r["media_id"]: r for r in feats}
    assert byid[1]["n_bytes"] == 8 and byid[1]["n_frames"] == 1
    assert byid[2]["n_frames"] >= 1
    assert byid[3]["n_bytes"] == 0
    frames = multimodal.frame_sample(df, every_n=2, decode_stub=True).collect()
    assert all(r["frame_idx"] % 2 == 0 for r in frames)
    # real decode degrades gracefully: optional-import probe, loud
    # NotImplementedError only when the library is genuinely absent
    if not multimodal.HAVE_PIL:
        with pytest.raises(Exception):
            multimodal.extract_features(df, decode_stub=False).collect()


def test_incremental_near_dups_verdicts(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "completely different words about spark shuffles and buckets"),
        ],
        ["doc_id", "text"],
    )
    incoming = spark.createDataFrame(
        [
            # byte-identical to corpus doc 1 -> exact
            (10, "the quick brown fox jumps over the lazy dog again and again"),
            # shares most shingles with doc 1 -> near
            (20, "the quick brown fox jumps over the lazy dog again and once"),
            # nothing in common -> novel
            (30, "entirely novel content with unique vocabulary tokens only"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["verdict"], r["match_id"], r["jaccard"])
        for r in dedup.incremental_near_dups(
            corpus, incoming, "doc_id", "text", jaccard_threshold=0.3
        ).collect()
    }
    assert out[10][0] == "exact" and out[10][1] == 1 and out[10][2] is None
    assert out[20][0] == "near" and out[20][1] == 1 and out[20][2] >= 0.3
    assert out[30] == ("novel", None, None)


def test_incremental_near_dups_never_self_joins_corpus(spark, docs):
    # corpus-side dup pairs must NOT appear: only incoming docs are output
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    out = dedup.incremental_near_dups(corpus, incoming, "doc_id", "text")
    ids = [r["doc_id"] for r in out.select("doc_id").collect()]
    assert all(i % 5 == 0 for i in ids)
    assert len(ids) == len(set(ids)) == incoming.filter(
        F.col("text").isNotNull()
    ).count()
