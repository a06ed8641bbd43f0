"""Dedup + similarity operator tests over the driver-provided testdata."""

from __future__ import annotations

import pandas as pd
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
        (4, "alpha beta gamma delta epsilon zeta eta theta"),  # == doc 1
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for mode in dedup.HASH_MODES:
        sim = dedup.simhash64(df, "doc_id", "text", hash_mode=mode).collect()
        assert len({r["simhash"] for r in sim}) >= 2
        cands = {
            (r["id_a"], r["id_b"])
            for r in dedup.simhash_near_dups(
                df, "doc_id", "text", hash_mode=mode
            ).collect()
        }
        # identical text ⇒ identical simhash ⇒ candidate, in ANY hash mode
        assert (1, 4) in cands
    # the 1-of-8-token near case banding under the md5 family (historical
    # fixture behavior; with 8 tokens the sign margins are thin, so which
    # near-misses band-collide legitimately varies by hash family)
    oracle_cands = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_near_dups(
            df, "doc_id", "text", hash_mode="oracle"
        ).collect()
    }
    assert (1, 2) in oracle_cands


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
        # oracle hash family pinned: the 'near' doc's true Jaccard is ~0.54,
        # so its band collision at n_hashes=4/n_bands=2 (P≈J²/band) is
        # family-dependent luck on a doc this small; the verdict MAPPING
        # being tested here is hash-independent
        for r in dedup.incremental_near_dups(
            corpus, incoming, "doc_id", "text", jaccard_threshold=0.3,
            hash_mode="oracle",
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
    # every incoming row gets exactly one verdict (null-text ones 'invalid')
    assert len(ids) == len(set(ids)) == incoming.count()


def test_incremental_null_text_is_invalid_not_novel(spark):
    """ADVICE r3: a null-text incoming doc must not leak out as 'novel'
    training data — it gets the dead-letterable 'invalid' verdict."""
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"), (2, None)],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [(10, None), (20, "totally fresh words nobody wrote before")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["verdict"], r["match_id"], r["jaccard"])
        for r in dedup.incremental_near_dups(
            corpus, incoming, "doc_id", "text"
        ).collect()
    }
    assert out[10] == ("invalid", None, None)
    assert out[20][0] == "novel"


def test_hash_modes_agree_on_decisions(spark, docs):
    """The xxhash64 production backend and the md5 oracle backend must make
    the same near-dup DECISIONS on the fixture: identical verified pair
    sets (Jaccard verify is hash-independent; only LSH candidate recall
    could differ) and identical incremental verdicts."""
    kw = dict(n_hashes=4, n_bands=2, jaccard_threshold=0.5, k=3)
    pair_sets = {}
    for mode in dedup.HASH_MODES:
        pairs = dedup.minhash_near_dups(
            docs, "doc_id", "text", hash_mode=mode, materialize=True, **kw
        )
        pair_sets[mode] = {
            (r["id_a"], r["id_b"], r["jaccard"]) for r in pairs.collect()
        }
    assert pair_sets["production"] == pair_sets["oracle"]
    assert len(pair_sets["oracle"]) > 0  # the comparison is not vacuous

    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    verdicts = {}
    for mode in dedup.HASH_MODES:
        out = dedup.incremental_near_dups(
            corpus, incoming, "doc_id", "text", hash_mode=mode,
            materialize=True, **kw
        )
        verdicts[mode] = {
            r["doc_id"]: (r["verdict"], r["match_id"], r["jaccard"])
            for r in out.collect()
        }
    assert verdicts["production"] == verdicts["oracle"]


def test_hash_mode_validation():
    with pytest.raises(ValueError, match="hash_mode"):
        dedup.hash64(F.lit("x"), hash_mode="md5")


def test_span_dedup_detects_cross_doc_paragraph(spark):
    """A paragraph duplicated across two otherwise-different docs is
    detected as an exact word span in each host doc; unique text never
    enters a span; docs with no shared grams are absent — in BOTH hash
    modes (span decisions are exact, not probabilistic)."""
    boiler = "subscribe to our newsletter for updates and exclusive offers today"
    rows = [
        (1, "unique alpha words one " + boiler + " trailing unique beta content"),
        (2, boiler + " totally different tail text here"),
        (3, "no shared content at all in this document whatsoever"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for mode in dedup.HASH_MODES:
        spans = {
            r["doc_id"]: (r["span_start"], r["span_end"], r["n_grams"])
            for r in dedup.span_dedup(
                df, "doc_id", "text", k=3, min_docs=2, hash_mode=mode
            ).collect()
        }
        # boiler is 10 words: doc1 hosts it at word 4..13, doc2 at 0..9;
        # 8 duplicated 3-grams each; unique pre/post text stays outside
        assert spans == {1: (4, 13, 8), 2: (0, 9, 8)}


def test_span_dedup_merges_nearby_and_skips_short_docs(spark):
    rows = [
        (1, "aa bb cc dd ee ff gg hh ii jj"),
        (2, "aa bb cc dd xx ff gg hh ii yy"),  # two shared runs, gap <= k
        (3, "aa bb"),  # shorter than k: no grams, never appears
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup.span_dedup(df, "doc_id", "text", k=3, min_docs=2)
    spans = {}
    for r in out.collect():
        spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    # duplicated grams: 'aa bb cc'/'bb cc dd' (pos 0,1) and
    # 'ff gg hh'/'gg hh ii' (pos 5,6): gap 5-1=4 > k=3 ⇒ two spans
    assert sorted(spans[1]) == [(0, 3), (5, 8)]
    assert sorted(spans[2]) == [(0, 3), (5, 8)]
    assert 3 not in spans


def test_multimodal_real_decode_path(spark):
    """The REAL decode path (decode_stub=False) over genuine bytes: a
    1-pixel PNG, a 2x3 24-bit BMP, and a 4-frame stereo WAV go through
    the Arrow mapInPandas stage and come back with true dimensions —
    _decode_real is no longer dead code in this environment (VERDICT r3)."""
    import struct, zlib

    # real, complete 1x1 PNG (IHDR + IDAT + IEND with correct CRCs)
    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"\x00\xff\x00\x00")
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", idat) + chunk(b"IEND", b""))

    # real 2x3 24-bit BMP (54-byte headers + padded pixel rows)
    row = b"\x00\x00\xff" * 2 + b"\x00\x00"  # 2 px + pad to 4-byte boundary
    px = row * 3
    bmp = (b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, 2, 3, 1, 24, 0, len(px), 0, 0, 0, 0)
           + px)

    # real 16-bit stereo 8kHz WAV with 4 sample frames
    data = b"\x01\x00" * 2 * 4
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
           + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)

    # real 3-frame 4x2 YUV4MPEG2 stream (4:2:0 -> 12 bytes/frame)
    y4m = b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420\n" + (
        b"FRAME\n" + bytes(12)
    ) * 3

    rows = [
        (1, "image", bytearray(png), None),
        (2, "image", bytearray(bmp), None),
        (3, "audio", bytearray(wav), None),
        (4, "video", bytearray(y4m), None),
    ]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    byid = {
        r["media_id"]: r
        for r in multimodal.extract_features(df, decode_stub=False).collect()
    }
    assert (byid[1]["width"], byid[1]["height"], byid[1]["n_frames"]) == (1, 1, 1)
    assert (byid[2]["width"], byid[2]["height"], byid[2]["n_frames"]) == (2, 3, 1)
    assert (byid[3]["width"], byid[3]["height"], byid[3]["n_frames"]) == (2, 8, 4)
    assert (byid[4]["width"], byid[4]["height"], byid[4]["n_frames"]) == (4, 2, 3)

    # frame sampling over the real video path: every 2nd frame of 3
    sampled = multimodal.frame_sample(df, every_n=2, decode_stub=False).collect()
    assert sorted(r["frame_idx"] for r in sampled) == [0, 2]

    # undecodable bytes on the real path stay LOUD
    bad = spark.createDataFrame(
        [(9, "video", bytearray(b"garbage"), None)], schema=multimodal.MEDIA_SCHEMA
    )
    with pytest.raises(Exception):
        multimodal.extract_features(bad, decode_stub=False).collect()


def test_best_rep_prefers_quality_over_min_id(spark):
    """A cluster whose higher-id member has better quality must keep THAT
    member, unlike the min-id is_rep convention."""
    from pyspark.sql import Window

    clusters = spark.createDataFrame(
        [(1, 1), (5, 1), (9, 1), (2, 2), (3, 2)],
        "doc_id long, cluster_id long",
    )
    quality = spark.createDataFrame(
        [(1, 0.3), (5, 0.9), (9, 0.9), (2, 0.5), (3, 0.5)],
        "doc_id long, quality double",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    out = (
        clusters.join(quality, "doc_id")
        .select("doc_id", "cluster_id",
                (F.row_number().over(w) == 1).alias("keep"))
        .collect()
    )
    kept = {r["cluster_id"]: r["doc_id"] for r in out if r["keep"]}
    assert kept[1] == 5   # best quality, tie on 0.9 → lower id among 5,9
    assert kept[2] == 2   # quality tie → min id
    assert sum(1 for r in out if r["keep"]) == 2


# ------------------------------------------- incremental index maintenance


def _random_delta(docs, seed):
    """Deterministic pseudo-random CDC delta over a (doc_id, text) corpus:
    ids ≡ 0 (mod 3+seed%3) deleted, ids ≡ 1 updated (text rewritten),
    fresh ids inserted. Returns (new_state, changed_ids)."""
    m = 3 + seed % 3
    deleted = F.col("doc_id") % m == 0
    updated = F.col("doc_id") % m == 1
    new_state = docs.filter(~deleted).withColumn(
        "text",
        F.when(updated, F.concat(F.lit(f"rewritten {seed} "), F.col("text")))
        .otherwise(F.col("text")),
    )
    base = docs.select(F.max("doc_id")).first()[0]
    inserts = docs.sparkSession.createDataFrame(
        [(base + 1 + i, f"brand new doc {seed} variant {i} text body")
         for i in range(4)],
        "doc_id long, text string",
    )
    new_state = new_state.unionByName(inserts)
    changed = docs.filter(deleted | updated).select("doc_id").unionByName(
        inserts.select("doc_id")
    )
    return new_state, changed


def test_maintain_minhash_index_equals_rebuild(spark):
    """maintain(index(old), delta, new) == index(new) for arbitrary
    deltas mixing deletes, updates, and inserts — the IVM contract of the
    dedup index, in production hash mode."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    for seed in (0, 1, 2):
        new_state, changed = _random_delta(docs, seed)
        old_index = dedup.minhash_signature(
            docs, "doc_id", "text", n_hashes=4, hash_mode="production"
        )
        maintained = dedup.maintain_minhash_index(
            old_index, changed, new_state, "doc_id", "text",
            n_hashes=4, hash_mode="production",
        ).toPandas().sort_values("doc_id").reset_index(drop=True)
        rebuilt = dedup.minhash_signature(
            new_state, "doc_id", "text", n_hashes=4, hash_mode="production"
        ).toPandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(maintained, rebuilt)
        # the delta must be non-vacuous in every direction
        assert changed.count() > 4                      # deletes/updates exist
        assert maintained["doc_id"].max() > docs.select(F.max("doc_id")).first()[0]


def test_maintain_index_joins_not_rescans(spark):
    """Structural pin: the maintained index keeps untouched rows through a
    LeftAnti id join and recomputes only a LeftSemi-pruned slice — no
    full-corpus re-hash path exists in the plan."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    new_state, changed = _random_delta(docs, 0)
    old_index = dedup.minhash_signature(
        docs, "doc_id", "text", n_hashes=4, hash_mode="production"
    )
    plan = dedup.maintain_minhash_index(
        old_index, changed, new_state, "doc_id", "text",
        n_hashes=4, hash_mode="production",
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftAnti" in plan
    assert "LeftSemi" in plan


def test_emb_truncate_renorm_unit_norm_and_usable(spark):
    """Truncated+renormalized prefixes are unit vectors, and prefix cosine
    preserves gross similarity structure on the fixture (a vector's best
    prefix-cosine match among 50 others is its best full-cosine match for
    most probes — the Matryoshka property the cheap tier relies on)."""
    import math

    from nifi_tekst_bundle_spark.plans import catalog

    out = catalog.q_emb_truncate_renorm(spark, "/root/testdata/sf0.001")
    pdf = out.toPandas()
    by_vec = pdf.groupby("vec_id")["val"].apply(lambda s: sum(x * x for x in s))
    assert by_vec.size > 0
    for vid, sq in by_vec.items():
        assert abs(sq - 1.0) < 1e-4, (vid, sq)
    assert set(pdf["dim_idx"].unique()) == set(range(16))


def test_winnowing_guarantee_and_density(spark):
    """The winnowing guarantee: two docs sharing a run of w+k-1 = 6 words
    must share at least one selected fingerprint VALUE; selection keeps
    far fewer than all grams (density ~2/(w+1)); both hash modes honor
    the guarantee."""
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"one two {shared} three four five six seven"),
        (2, f"nine ten eleven twelve {shared} thirteen fourteen"),
        (3, "totally unrelated words in this document about nothing at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for mode in dedup.HASH_MODES:
        fp = dedup.winnow_fingerprints(
            df, "doc_id", "text", k=3, w=4, hash_mode=mode
        ).toPandas()
        by_doc = {d: set(g["fp"]) for d, g in fp.groupby("doc_id")}
        assert by_doc[1] & by_doc[2], f"guarantee violated in {mode}"
        assert not (by_doc[1] & by_doc[3])
    # density: far fewer fingerprints than grams on the corpus
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_grams = docs.filter(F.col("text").isNotNull()).select(
        F.greatest(
            F.size(F.split(F.lower(F.trim("text")), r"\s+")) - 2, F.lit(0)
        ).alias("g")
    ).agg(F.sum("g")).first()[0]
    n_fp = dedup.winnow_fingerprints(docs, "doc_id", "text").count()
    assert n_fp < 0.6 * n_grams  # ~2/(w+1)=0.4 expected, margin for dups


def test_winnowing_short_docs(spark):
    """Docs with < k words emit nothing; docs with >= k but < w grams
    emit exactly the single whole-prefix window min."""
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c d")], ["doc_id", "text"]
    )
    out = dedup.winnow_fingerprints(df, "doc_id", "text", k=3, w=4).collect()
    assert {r["doc_id"] for r in out} == {2}
    assert len(out) == 1  # 2 grams -> one window -> one selection


def test_winnowing_matches_serial_reference_on_random_corpora(spark):
    """Distributed winnowing == a direct serial implementation of the
    Schleimer et al. algorithm (same hash, same leftmost-tie rule) on
    seeded pseudo-random corpora — catches window/boundary bugs the
    fixture oracle might not cover."""
    import hashlib
    import random

    k, w = 3, 4
    for seed in (0, 1, 2):
        rng = random.Random(seed)
        vocab = [f"w{j}" for j in range(12)]  # small vocab -> repeats/ties
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            (r["doc_id"], r["pos"], r["fp"])
            for r in dedup.winnow_fingerprints(
                df, "doc_id", "text", k=k, w=w, hash_mode="oracle"
            ).collect()
        }
        want = set()
        for doc_id, text in rows:
            words = [x for x in text.strip().lower().split()]
            if len(words) < k:
                continue
            hs = []
            for i in range(len(words) - k + 1):
                gram = " ".join(words[i : i + k])
                hs.append(int(hashlib.md5(gram.encode()).hexdigest()[:15], 16))
            n = len(hs)
            for j in range(max(n - w, 0) + 1):
                win = hs[j : j + w]
                v = min(win)
                p = j + win.index(v)  # leftmost tie
                want.add((doc_id, p, v))
        assert got == want, f"seed {seed}"


def test_bpe_learn_matches_serial_on_random_corpora(spark):
    from nifi_tekst_bundle_spark.operators import lm
    import collections
    import random

    for seed in (0, 1):
        rng = random.Random(seed)
        alphabet = "abcde"
        rows = [
            (i, " ".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(1, 8))
            ))
            for i in range(30)
        ]
        df = spark.createDataFrame(rows, ["i", "text"])
        merges = lm.bpe_learn(df, "text", n_merges=3)

        vocab = collections.Counter(
            wd for _, t in rows for wd in t.strip().lower().split() if wd
        )
        seqs = {wd: list(wd) for wd in vocab}
        expected = []
        for _ in range(3):
            c = collections.Counter()
            for wd, f in vocab.items():
                s = seqs[wd]
                for a, b in zip(s, s[1:]):
                    c[(a, b)] += f
            if not c:
                break
            (a, b), nbest = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
            if nbest < 2:
                break
            expected.append((a, b))
            for wd in seqs:
                out = []
                for sym in seqs[wd]:
                    if out and out[-1] == a and sym == b:
                        out[-1] = a + b
                    else:
                        out.append(sym)
                seqs[wd] = out
        assert merges == expected, f"seed {seed}"
