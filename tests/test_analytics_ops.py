"""Round-4 analytics operators: priority sampling, watermark-lag
freshness, CCNet quality buckets, ordered funnel, cohort retention."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nifi_tekst_bundle_spark.operators import shard
from nifi_tekst_bundle_spark.plans import catalog

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------ priority sampling


def test_priority_sample_is_weighted_and_deterministic(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    s1 = shard.priority_sample(docs, "n_chars", 50).toPandas()
    s2 = shard.priority_sample(docs, "n_chars", 50).toPandas()
    assert len(s1) == 50
    assert list(s1["doc_id"]) == list(s2["doc_id"])  # replay-stable
    # weighted: long documents are overrepresented relative to uniform
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    assert s1["n_chars"].mean() > corpus_mean
    # priorities arrive sorted descending and are exactly w/u
    assert list(s1["priority"]) == sorted(s1["priority"], reverse=True)


def test_priority_sample_matches_serial_topk(spark):
    """The distributed TakeOrdered top-k equals a serial recompute of
    priority = w / ((hash64(id)+1)/2^60) over the whole corpus."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = shard.priority_sample(docs, "n_chars", 10).toPandas()
    import hashlib

    rows = docs.select("doc_id", "n_chars").collect()
    pri = []
    for r in rows:
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:15], 16)
        pri.append((r.n_chars / ((h + 1) / float(1 << 60)), r.doc_id))
    want = sorted(pri, key=lambda t: (-t[0], t[1]))[:10]
    assert [d for _, d in want] == list(got["doc_id"])


def test_priority_sample_plan_has_no_full_sort(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = shard.priority_sample(docs, "n_chars", 50)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort shuffle


# ------------------------------------------------------- watermark lag


def test_watermark_lag_nonnegative_and_zero_at_global_max(spark):
    out = catalog.q_cdc_watermark_lag(spark, SF).toPandas()
    assert (out["lag_micros"] >= 0).all()
    assert (out["lag_micros"] == 0).sum() >= 1  # the watermark bucket
    assert out["bucket"].between(0, 15).all()
    # every event is accounted for exactly once
    n = spark.read.parquet(f"{SF}/events.parquet").count()
    assert int(out["n_events"].sum()) == n


# ----------------------------------------------------- quality buckets


def test_quality_buckets_are_balanced_terciles(spark):
    out = catalog.q_docs_quality_buckets(spark, SF).toPandas()
    for _, grp in out.groupby("lang"):
        sizes = grp["ccnet_bucket"].value_counts()
        assert sizes.max() - sizes.min() <= 1  # ntile balance
        # head quality dominates tail quality per language
        assert (
            grp[grp.ccnet_bucket == "head"]["quality"].min()
            >= grp[grp.ccnet_bucket == "tail"]["quality"].max()
        )


# --------------------------------------------------------------- funnel


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_funnel_requires_strict_ordering(spark):
    t = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # u1: full ordered funnel
        (1, t, 1, "view"), (2, t + s, 1, "click"), (3, t + 2 * s, 1, "purchase"),
        # u2: click BEFORE the first view -> stage stops at 1
        (4, t, 2, "click"), (5, t + s, 2, "view"),
        # u3: view then purchase but no click in between -> stage 1
        (6, t, 3, "view"), (7, t + s, 3, "purchase"),
        # u4: never views -> not in the funnel at all
        (8, t, 4, "click"), (9, t + s, 4, "purchase"),
    ]
    ev = _ev(spark, rows)
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    # reuse the catalog shape through a temp dir is overkill; assert via
    # the same composition the query uses
    import tempfile, os

    d = tempfile.mkdtemp()
    ev.withColumn("value", F.lit(0.0)).withColumn(
        "props", F.lit(None).cast("string")
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = catalog.q_events_funnel(spark, d).toPandas().set_index("user_id")
    assert out.loc[1, "stage"] == 3
    assert out.loc[2, "stage"] == 1
    assert out.loc[3, "stage"] == 1
    assert 4 not in out.index
    assert v.count() == 3


def test_funnel_stage_counts_monotone_on_fixture(spark):
    out = catalog.q_events_funnel(spark, SF).toPandas()
    # stage k is reached by a superset of stage k+1 reachers
    n1 = (out["stage"] >= 1).sum()
    n2 = (out["stage"] >= 2).sum()
    n3 = (out["stage"] >= 3).sum()
    assert n1 >= n2 >= n3
    assert n1 == len(out)
    # t ordering holds wherever present
    full = out[out.stage == 3]
    assert (full["t_view"] < full["t_click"]).all()
    assert (full["t_click"] < full["t_purchase"]).all()


# ------------------------------------------------------------ retention


def test_retention_day0_counts_every_cohort_user(spark):
    out = catalog.q_events_retention(spark, SF).toPandas()
    users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    # offset 0 rows together count every user exactly once
    assert int(out[out.offset_days == 0]["n_users"].sum()) == users
    assert out["offset_days"].between(0, 13).all()
    # retention never exceeds the cohort's day-0 size
    for _, grp in out.groupby("cohort_week"):
        d0 = int(grp[grp.offset_days == 0]["n_users"].iloc[0])
        assert (grp["n_users"] <= d0).all()


# ------------------------------------------- transcript split/scrub/dedup


def test_train_eval_split_is_stable_and_key_level(spark):
    out = catalog.q_conv_train_eval_split(spark, SF).toPandas()
    again = catalog.q_conv_train_eval_split(spark, SF).toPandas()
    m1 = dict(zip(out["conv_id"], out["split"]))
    m2 = dict(zip(again["conv_id"], again["split"]))
    assert m1 == m2  # replay-stable assignment
    frac = (out["split"] == "eval").mean()
    assert 0.0 < frac < 0.15  # ~5% hold-out on the fixture
    assert (out["n_turns"] >= 1).all()


def test_scrub_turns_gates_on_role(spark):
    from nifi_tekst_bundle_spark.operators import transcript

    df = spark.createDataFrame(
        [
            ("c1", 0, "user", "mail me at bob@x.example.org now"),
            ("c1", 1, "assistant", "ok bob@x.example.org noted"),
            ("c1", 2, "user", None),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = transcript.scrub_turns(
        df, scrub_roles=("user",),
        patterns={"<EMAIL>": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"},
    ).toPandas().set_index("turn_idx")
    assert out.loc[0, "text"] == "mail me at <EMAIL> now"
    assert out.loc[0, "n_redactions"] == 1
    # assistant turn keeps its address bit-identical
    assert out.loc[1, "text"] == "ok bob@x.example.org noted"
    assert out.loc[1, "n_redactions"] == 0
    assert out.loc[2, "text"] is None or out.loc[2, "text"] != out.loc[2, "text"]


def test_conv_near_dups_detects_seeded_duplicate_conversation(spark):
    from nifi_tekst_bundle_spark.operators import dedup

    turns = [("conv-a", i, f"tok{i} word{i} filler{i}") for i in range(12)]
    # near-dup: same conversation with ONE changed turn
    turns += [
        ("conv-b", i, f"tok{i} word{i} filler{i}" if i != 5 else "edited turn")
        for i in range(12)
    ]
    # unrelated conversation
    turns += [("conv-c", i, f"zzz{i} qqq{i} xxx{i}") for i in range(12)]
    df = spark.createDataFrame(turns, "conv_id string, turn_idx int, text string")
    from pyspark.sql import functions as FF

    fold = FF.array_join(
        FF.transform(
            FF.array_sort(
                FF.collect_list(FF.struct(FF.col("turn_idx").alias("k"),
                                          FF.col("text").alias("v")))
            ),
            lambda x: x["v"],
        ),
        " ",
    )
    folded = df.groupBy("conv_id").agg(fold.alias("text")).select(
        FF.col("conv_id").alias("doc_id"), "text"
    )
    # 8 hashes / 4 bands: single-row bands, so one matching minhash is
    # enough to candidate the pair — deterministic recall on this fixture
    # (the catalog query's 4/2 setting trades recall for bucket size)
    pairs = dedup.minhash_near_dups(
        folded, "doc_id", "text", n_hashes=8, n_bands=8,
        jaccard_threshold=0.5, k=3,
    ).toPandas()
    assert ("conv-a", "conv-b") in set(zip(pairs["id_a"], pairs["id_b"]))
    assert not any("conv-c" in p for pair in zip(pairs["id_a"], pairs["id_b"]) for p in pair)


# ------------------------------------------------------ BPE pair counting


def test_bpe_pair_counts_hand_checked(spark):
    """Weighted adjacent-char pair counts over the distinct-word table:
    'ab ab abc' -> word freqs {ab:2, abc:1} -> (a,b): 2+1=3, (b,c): 1."""
    df = spark.createDataFrame(
        [(1, "ab ab"), (2, "Abc"), (3, None), (4, "x")],
        ["doc_id", "text"],
    )
    from nifi_tekst_bundle_spark.operators import lm

    got = {
        (r["left_sym"], r["right_sym"]): r["pair_count"]
        for r in lm.bpe_pair_counts(df, "text").collect()
    }
    # 'x' has no pairs; None text dropped; 'Abc' lowercases
    assert got == {("a", "b"): 3, ("b", "c"): 1}


def test_bpe_pair_counts_expands_vocab_not_corpus(spark):
    """The pair-generation stage must consume the AGGREGATED word table
    (vocabulary-sized), not the raw token stream: exactly one aggregate
    sits between the corpus scan and the pair explode."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from nifi_tekst_bundle_spark.operators import lm

    plan = lm.bpe_pair_counts(docs, "text")._jdf.queryExecution().executedPlan().toString()
    # explode(words) feeds an agg; explode(pairs) reads the agg output —
    # two generates, and the pair generate must sit ABOVE the first agg
    assert plan.count("Generate") >= 2
    assert "HashAggregate" in plan


def test_bpe_learn_classic_example(spark):
    """The canonical BPE toy corpus: with word freqs low×5, lower×2,
    newest×6, widest×3, the trainer must learn 'es'+'t' style merges in
    frequency order; replaying the learned merges serially reproduces
    the same pair choices."""
    rows = (["low"] * 5) + (["lower"] * 2) + (["newest"] * 6) + (["widest"] * 3)
    df = spark.createDataFrame([(i, w) for i, w in enumerate(rows)], ["i", "text"])
    from nifi_tekst_bundle_spark.operators import lm

    merges = lm.bpe_learn(df, "text", n_merges=4)
    # serial reference implementation
    import collections

    vocab = collections.Counter(rows)
    seqs = {w: list(w) for w in vocab}

    def top_pair():
        c = collections.Counter()
        for w, f in vocab.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                c[(a, b)] += f
        if not c:
            return None
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        return best if best[1] >= 2 else None

    expected = []
    for _ in range(4):
        t = top_pair()
        if t is None:
            break
        (a, b), _n = t
        expected.append((a, b))
        for w in seqs:
            s, out = seqs[w], []
            for sym in s:
                if out and out[-1] == a and sym == b:
                    out[-1] = a + b
                else:
                    out.append(sym)
            seqs[w] = out
    assert merges == expected
    assert len(merges) == 4
    # first merge must involve the most frequent adjacent pair of the
    # corpus ('es' appears in newest(6)+widest(3)=9 — the max)
    assert merges[0] == ("e", "s")


def test_bpe_learn_stops_when_no_pair_repeats(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], ["i", "text"])
    from nifi_tekst_bundle_spark.operators import lm

    assert lm.bpe_learn(df, "text", n_merges=5) == []


def _serial_bpe_encode(text: str, merges) -> list[str]:
    """Serial reference encoder: per word, apply merges in learned order,
    one greedy non-overlapping left-to-right pass each — the exact
    semantics of lm._merge_fold and the trainer's vocabulary rewrite."""
    toks = []
    for w in text.strip().lower().split():
        if not w:
            continue
        syms = list(w)
        for left, right in merges:
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            syms = out
        toks.extend(syms)
    return toks


def test_bpe_encode_matches_serial_reference_on_random_corpora(spark):
    """learn→encode end-to-end vs the serial reference on deterministic
    pseudo-random corpora over a small alphabet (dense adjacent-pair
    repetition — merge-chain collisions, multi-char merges, words that
    collapse to one token)."""
    import hashlib

    from nifi_tekst_bundle_spark.operators import lm

    for seed in ["s1", "s2"]:
        alpha = "abc"
        words = []
        for i in range(120):
            h = hashlib.md5(f"{seed}|{i}".encode()).digest()
            n = 1 + h[0] % 7
            words.append("".join(alpha[h[j + 1] % len(alpha)] for j in range(n)))
        docs = [" ".join(words[i:i + 6]) for i in range(0, 120, 6)]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
        )
        merges = lm.bpe_learn(df, "text", n_merges=6)
        assert merges  # dense corpus must learn something
        got = {
            r["doc_id"]: r for r in lm.bpe_encode(df, merges, "doc_id").collect()
        }
        for i, t in enumerate(docs):
            want = _serial_bpe_encode(t, merges)
            assert list(got[i]["tokens"]) == want, (seed, i, t)
            assert got[i]["n_tokens"] == len(want)
            assert got[i]["n_merged"] == sum(1 for x in want if len(x) > 1)


def test_bpe_encode_empty_and_null_docs_dropped(spark):
    from nifi_tekst_bundle_spark.operators import lm

    df = spark.createDataFrame(
        [(0, "aa ab"), (1, None), (2, "   "), (3, "")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in lm.bpe_encode(df, [("a", "a")]).collect()}
    assert set(got) == {0}
    assert list(got[0]["tokens"]) == ["aa", "a", "b"]


# ------------------------------------------------------ rate anomaly


def test_rate_anomaly_flags_seeded_spike(spark, tmp_path):
    """A constructed 10x traffic spike in one hour must be the (only)
    anomalous window for its type; steady types flag nothing. Exercises
    the SHIPPED catalog.q_events_rate_anomaly on a seeded events.parquet
    fixture dir (ADVICE r4: the earlier version re-implemented the
    z-score inline, validating a copy of the logic)."""
    import datetime as dt

    from nifi_tekst_bundle_spark.plans import catalog as cat

    rows = []
    base = dt.datetime(2026, 1, 1)
    for h in range(8):
        n = 100 if h != 5 else 1000  # spike hour
        for i in range(n):
            rows.append(("click", base + dt.timedelta(hours=h, seconds=i % 3000)))
        for i in range(50):  # steady type
            rows.append(("view", base + dt.timedelta(hours=h, seconds=i)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    fixture_dir = str(tmp_path / "sf_seeded")
    df.coalesce(1).write.parquet(fixture_dir + "/events.parquet")
    out = cat.q_events_rate_anomaly(spark, fixture_dir).collect()
    anomalies = {(r["event_type"], r["window_start"].hour)
                 for r in out if r["is_anomaly"]}
    assert anomalies == {("click", 5)}
    # the steady type's windows are all present and unflagged
    assert sum(1 for r in out if r["event_type"] == "view") == 8
