"""Transcript-native operator tests (operators/transcript.py): SFT loss
mask, context-window truncation, structure dedup, loop detection, role
alternation — semantics on hand-built conversations where the expected
output is computable by eye."""

from __future__ import annotations

from pyspark.sql import functions as F

from nifi_tekst_bundle_spark.operators import transcript


def _tr(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )


def test_estimated_tokens_rule(spark):
    df = spark.createDataFrame(
        [("", ), ("a",), ("abcd",), ("abcde",), (None,)], "text string"
    ).select(transcript.estimated_tokens(F.col("text")).alias("t"))
    # '' -> min 1; 1..4 chars -> 1; 5 chars -> 2; NULL -> 0
    assert [r["t"] for r in df.collect()] == [1, 1, 1, 2, 0]


def test_loss_mask_flags_only_completion_turns_with_text(spark):
    df = _tr(spark, [
        ("c1", 0, "user", "hello there",  None),   # 3 tokens
        ("c1", 1, "assistant", "hi", None),        # 1 token, train
        ("c1", 2, "assistant", None, None),        # 0 tokens -> NOT train
        ("c1", 3, "user", "bye", None),            # 1 token
        ("c1", 4, "assistant", "farewell now", None),  # 3 tokens, train
    ])
    out = {
        r["turn_idx"]: r
        for r in transcript.loss_mask(df, "assistant").collect()
    }
    assert [out[i]["train"] for i in range(5)] == [False, True, False, False, True]
    # token_start = cumulative tokens of preceding turns
    assert [out[i]["token_start"] for i in range(5)] == [0, 3, 4, 4, 5]
    assert out[4]["n_tokens"] == 3


def test_truncate_keeps_longest_suffix_within_budget(spark):
    df = _tr(spark, [
        ("c1", 0, "user", "x" * 16, None),   # 4 tokens
        ("c1", 1, "assistant", "x" * 8, None),   # 2 tokens
        ("c1", 2, "user", "x" * 12, None),   # 3 tokens
        ("c1", 3, "assistant", "x" * 4, None),   # 1 token
        # suffix sums from end: t3=1, t2=4, t1=6, t0=10
        ("c2", 0, "user", "x" * 100, None),  # 25 tokens > budget alone
    ])
    out = transcript.truncate_to_budget(df, budget=5).collect()
    kept = sorted((r["conv_id"], r["turn_idx"]) for r in out)
    # c1: turns 2,3 fit (4 <= 5); adding turn 1 would reach 6 > 5.
    # c2: nothing fits.
    assert kept == [("c1", 2), ("c1", 3)]
    by_turn = {r["turn_idx"]: r["rev_cum_tokens"] for r in out}
    assert by_turn == {3: 1, 2: 4}


def test_structure_dedup_groups_identical_role_tool_sequences(spark):
    df = _tr(spark, [
        # c1 and c3 share the (role, tool) sequence; c2 differs by tool
        ("c1", 0, "user", "alpha", None),
        ("c1", 1, "assistant", "beta", "search"),
        ("c2", 0, "user", "gamma", None),
        ("c2", 1, "assistant", "delta", None),
        ("c3", 0, "user", "epsilon", None),
        ("c3", 1, "assistant", "zeta", "search"),
    ])
    out = {r["conv_id"]: r for r in transcript.structure_dedup(df).collect()}
    assert out["c1"]["canonical_conv_id"] == "c1" and not out["c1"]["is_dup"]
    assert out["c3"]["canonical_conv_id"] == "c1" and out["c3"]["is_dup"]
    assert out["c2"]["canonical_conv_id"] == "c2" and not out["c2"]["is_dup"]
    assert out["c1"]["sig_md5"] == out["c3"]["sig_md5"] != out["c2"]["sig_md5"]


def test_turn_loops_counts_repeats_including_empty_payloads(spark):
    df = _tr(spark, [
        ("c1", 0, "assistant", "same", None),
        ("c1", 1, "user", "q", None),
        ("c1", 2, "assistant", "same", None),   # repeat 1
        ("c1", 3, "assistant", "same", None),   # repeat 2
        ("c1", 4, "assistant", None, None),
        ("c1", 5, "assistant", None, None),     # empty-payload repeat
        ("c2", 0, "user", "unique", None),
    ])
    out = {r["conv_id"]: r for r in transcript.turn_loops(df).collect()}
    # c1: 'assistant~same' x3 (2 loops) + 'assistant~' x2 (1 loop)
    assert out["c1"]["n_loop_turns"] == 3
    assert out["c1"]["max_repeat"] == 3
    assert out["c2"]["n_loop_turns"] == 0 and out["c2"]["max_repeat"] == 1


def test_role_alternation_flags_consecutive_same_role(spark):
    df = _tr(spark, [
        ("c1", 0, "user", "a", None),
        ("c1", 1, "assistant", "b", None),
        ("c1", 2, "user", "c", None),
        ("c2", 0, "user", "a", None),
        ("c2", 1, "user", "b", None),        # repeat
        ("c2", 2, None, "c", None),
        ("c2", 3, None, "d", None),          # NULL-role repeat counts too
    ])
    out = {r["conv_id"]: r for r in transcript.role_alternation(df).collect()}
    assert out["c1"]["alternates"] and out["c1"]["n_role_repeats"] == 0
    assert out["c1"]["first_role"] == "user" and out["c1"]["last_role"] == "user"
    assert not out["c2"]["alternates"] and out["c2"]["n_role_repeats"] == 2
    assert out["c2"]["n_roles"] == 2  # user + NULL-as-a-role
    assert out["c2"]["last_role"] == ""  # NULL rendered as ''


def test_tool_usage_rollup(spark):
    df = _tr(spark, [
        ("c1", 0, "user", "abcd", None),
        ("c1", 1, "assistant", "abcdefgh", "search"),
        ("c2", 0, "assistant", None, "search"),
    ])
    out = {r["tool"]: r for r in transcript.tool_usage(df).collect()}
    assert out["none"]["n_turns"] == 1 and out["none"]["n_convs"] == 1
    assert out["search"]["n_turns"] == 2 and out["search"]["n_convs"] == 2
    assert out["search"]["avg_tokens"] == 1.0  # (2 + 0) / 2
    assert out["none"]["avg_tokens"] == 1.0


def test_clean_transcripts_composed_gates(spark):
    """Each gate independently removes its target conversation; the
    survivor comes out truncated to the budget."""
    rows = [
        # a_ok: alternating, no loops, canonical for its structure
        # (it sorts before its structural twin c_dup)
        ("a_ok", 0, "user", "x" * 8, None),        # 2 tokens
        ("a_ok", 1, "assistant", "x" * 4, "t1"),   # 1 token
        ("a_ok", 2, "user", "x" * 8, None),        # 2 tokens
        # c_rep: all same role -> repeat rate 3/4 > 0.25 (alternation gate)
        ("c_rep", 0, "user", "u0", None),
        ("c_rep", 1, "user", "u1", None),
        ("c_rep", 2, "user", "u2", None),
        ("c_rep", 3, "user", "u3", None),
        # c_dup: same (role, tool) structure as a_ok -> structure-dedup gate
        ("c_dup", 0, "user", "different a", None),
        ("c_dup", 1, "assistant", "different b", "t1"),
        ("c_dup", 2, "user", "different c", None),
        # c_loop: perfectly alternating roles, but 'assistant~same' appears
        # 4 times (> max_turn_repeat 3) -> loop gate only
        ("c_loop", 0, "user", "q", None),
        ("c_loop", 1, "assistant", "same", None),
        ("c_loop", 2, "user", "a", None),
        ("c_loop", 3, "assistant", "same", None),
        ("c_loop", 4, "user", "b", None),
        ("c_loop", 5, "assistant", "same", None),
        ("c_loop", 6, "user", "c", None),
        ("c_loop", 7, "assistant", "same", None),
    ]
    df = _tr(spark, rows)
    out = transcript.clean_transcripts(df, budget=3).collect()
    assert {r["conv_id"] for r in out} == {"a_ok"}
    # budget 3: suffix sums from the end: t2=2, t1=3, t0=5 -> keep t1,t2
    assert sorted(r["turn_idx"] for r in out) == [1, 2]
    # payload columns ride through
    assert {r["turn_idx"]: r["role"] for r in out} == {1: "assistant", 2: "user"}


def test_boilerplate_turns_requires_distinct_convs(spark):
    """Only texts spread across >= min_convs DISTINCT conversations are
    boilerplate; a text repeated many times inside ONE conversation is a
    loop (turn_loops' job), not boilerplate."""
    rows = (
        # 'canned' in 3 conversations (4 turns total)
        [("c1", 0, "assistant", "canned", None),
         ("c2", 0, "assistant", "canned", None),
         ("c3", 0, "assistant", "canned", None),
         ("c3", 1, "assistant", "canned", None)]
        # 'looped' 3 times but inside one conversation
        + [("c4", i, "assistant", "looped", None) for i in range(3)]
        # nulls never count
        + [("c5", 0, "user", None, None), ("c6", 0, "user", None, None),
           ("c7", 0, "user", None, None)]
    )
    out = {r["text"]: r for r in transcript.boilerplate_turns(
        _tr(spark, rows), min_convs=3).collect()}
    assert set(out) == {"canned"}
    assert out["canned"]["n_convs"] == 3 and out["canned"]["n_turns"] == 4


def test_transcript_ops_single_shuffle_no_python(spark):
    """Plan pins: each per-conversation operator shuffles exactly once
    (on conv_id) and keeps every expression JVM-side (no BatchEvalPython /
    ArrowEvalPython in the plan)."""
    df = _tr(spark, [("c1", 0, "user", "a", None)])
    for op in (
        lambda d: transcript.loss_mask(d, "assistant"),
        lambda d: transcript.truncate_to_budget(d, 5),
    ):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        assert "EvalPython" not in plan, plan
    plan = (
        transcript.role_alternation(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # window by conv_id then groupBy conv_id: the agg reuses the window's
    # hash partitioning, so still one exchange
    assert plan.count("Exchange") == 1, plan
    assert "EvalPython" not in plan, plan


def test_split_leakage_detects_straddling_pair_only(spark):
    """Only near-dup pairs with differing split assignments surface."""
    from pyspark.sql import functions as F

    from nifi_tekst_bundle_spark.operators.dedup import hash64

    pairs = spark.createDataFrame(
        [("ca", "cb", 0.9), ("cc", "cd", 0.8)],
        "id_a string, id_b string, jaccard double",
    )

    def split(c):
        return F.when(
            hash64(F.col(c).cast("string")) % 100 < 30, F.lit("eval")
        ).otherwise(F.lit("train"))

    out = (
        pairs.select(
            "id_a", "id_b", "jaccard",
            split("id_a").alias("split_a"), split("id_b").alias("split_b"),
        )
        .filter(F.col("split_a") != F.col("split_b"))
        .collect()
    )
    # recompute expectations directly from the hash
    rows = spark.createDataFrame(
        [("ca",), ("cb",), ("cc",), ("cd",)], "c string"
    ).select("c", (hash64(F.col("c")) % 100 < 30).alias("e")).collect()
    ev = {r["c"]: r["e"] for r in rows}
    expect = {
        ("ca", "cb")} if ev["ca"] != ev["cb"] else set()
    if ev["cc"] != ev["cd"]:
        expect.add(("cc", "cd"))
    assert {(r["id_a"], r["id_b"]) for r in out} == expect
