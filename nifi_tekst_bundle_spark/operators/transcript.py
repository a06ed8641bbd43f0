"""Transcript-native operators over the applied conversation table.

The engine's CDC pipeline lands a table of multi-turn conversation /
agent transcripts keyed by (conv_id, turn_idx) with payload
(role, text, tool).  The reference's per-document post-processing steps
(ordered fold + render, CreateMetsBrowsing.kt:161-312; per-doc validation
routing, Jhove.kt:55-112) generalize here to the per-CONVERSATION steps a
training-data pipeline runs after ingest:

- dialogue-structure validation (role alternation, loop detection)
- SFT loss-mask construction (which turns are trained on, token offsets)
- context-window truncation (longest whole-turn suffix under a budget)
- conversation-level dedup by interaction structure
- tool-usage rollups

Scale contract shared by every operator in this module: all windows are
partitioned by ``conv_id`` and conversations are BOUNDED (a conversation
is never corpus-sized), so each operator is the one-shuffle-by-conv_id
shape; no global sort, no driver collect, no Python in the hot path —
every expression is a JVM built-in that stays inside whole-stage codegen.
That shape survives 10^10 turns: the shuffle key is the natural
partitioning key of the table, and AQE handles residual skew.

Token counts use a deterministic BPE-ish estimate (ceil(chars/4), min 1
for non-null text) — the industry rule-of-thumb for budget planning; the
exact tokenizer is deployment-specific and pluggable via ``tokens_col``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Sentinel for NULL roles/payloads inside comparisons: \x01 cannot occur in
# fixture text, so coalescing to it makes equality null-safe on both engines
# (Spark eqNullSafe and DuckDB IS NOT DISTINCT FROM disagree on frame
# boundaries; a sentinel sidesteps the dialect gap entirely).
_NULL_SENTINEL = "\x01"


def estimated_tokens(text: Column) -> Column:
    """BPE-ish token estimate: ceil(len/4), min 1; NULL text -> 0.

    Pure JVM arithmetic (no tokenizer UDF) — the standard planning
    estimate for token budgets; swap in a real tokenizer count column
    where exactness matters (docs_token_stats has the regex form).
    """
    return (
        F.when(text.isNull(), F.lit(0))
        .otherwise(F.greatest(F.lit(1), F.ceil(F.length(text) / 4)))
        .cast("long")
    )


def role_alternation(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
) -> DataFrame:
    """Per-conversation dialogue-structure validation.

    Flags conversations whose role sequence violates strict alternation
    (two consecutive turns with the same role — the classic symptom of a
    broken scrape or a stuck agent).  Emits per conversation:

    - n_turns, n_roles (distinct, NULL counted as its own role)
    - n_role_repeats: consecutive same-role turn pairs
    - first_role / last_role (turn order; NULL rendered as '')
    - alternates: true iff no repeats

    One window + one groupBy, both keyed by conv_id — a single shuffle.
    The reference's per-document validate-and-route (Jhove.kt:55-112)
    applied at conversation granularity.
    """
    r = F.coalesce(F.col(role_col), F.lit(_NULL_SENTINEL))
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    seq = df.select(
        F.col(conv_col),
        F.col(turn_col),
        r.alias("_r"),
        (F.lag(r).over(w)).alias("_prev"),
        F.row_number().over(w).alias("_rn"),
    )
    rep = (F.col("_rn") > 1) & (F.col("_prev") == F.col("_r"))
    shown = F.when(F.col("_r") == _NULL_SENTINEL, F.lit("")).otherwise(F.col("_r"))
    return seq.groupBy(conv_col).agg(
        F.count("*").alias("n_turns"),
        F.countDistinct("_r").alias("n_roles"),
        F.sum(rep.cast("long")).alias("n_role_repeats"),
        F.min_by(shown, F.col(turn_col)).alias("first_role"),
        F.max_by(shown, F.col(turn_col)).alias("last_role"),
        (F.sum(rep.cast("long")) == 0).alias("alternates"),
    )


def loss_mask(
    df: DataFrame,
    completion_role: str,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """SFT loss-mask construction: which turns are trained on, and where
    each turn's tokens land in the packed conversation.

    Emits per turn: ``train`` (completion-role turn with non-empty
    text), ``n_tokens``, and ``token_start`` — the cumulative token
    offset of the turn within its conversation (sum of all preceding
    turns' tokens, 0 for the first).  Downstream packing/labeling reads
    [token_start, token_start + n_tokens) as the turn's span.

    One window partitioned by conv_id (bounded frames) — single shuffle.
    """
    toks = estimated_tokens(F.col(text_col))
    w = (
        Window.partitionBy(conv_col)
        .orderBy(turn_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # non-empty means actual characters: estimated_tokens('') is 1 (a
    # planning floor), so gate on text length, not on the token estimate
    train = (
        F.coalesce(F.col(role_col), F.lit("")) == completion_role
    ) & (F.length(F.coalesce(F.col(text_col), F.lit(""))) > 0)
    return df.select(
        F.col(conv_col),
        F.col(turn_col),
        train.alias("train"),
        toks.alias("n_tokens"),
        F.coalesce(F.sum(toks).over(w), F.lit(0)).cast("long").alias("token_start"),
    )


def truncate_to_budget(
    df: DataFrame,
    budget: int,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Context-window truncation: keep the longest SUFFIX of whole turns
    whose total estimated tokens fit the budget.

    The standard "fit the conversation into the model's context" step —
    the most recent turns matter most, turns are never split.  A turn is
    kept iff the running token total from the conversation's END back to
    (and including) that turn is <= budget.  Emits kept turns with their
    token count and reverse-cumulative total.

    One window (conv_id partition, turn_idx DESC order) — single
    shuffle; the filter is a pure narrow post-window predicate. All of
    ``df``'s columns ride through so the output is the truncated table
    itself, not just an index of kept turns.
    """
    toks = estimated_tokens(F.col(text_col))
    w = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(turn_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.select(
            "*",
            toks.alias("n_tokens"),
            F.sum(toks).over(w).cast("long").alias("rev_cum_tokens"),
        )
        .filter(F.col("rev_cum_tokens") <= budget)
    )


def structure_dedup(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    sig_cols: tuple[str, ...] = ("role", "tool"),
) -> DataFrame:
    """Conversation-level dedup by interaction STRUCTURE.

    Two conversations are duplicates when their ordered
    (role, tool, ...) turn signatures are identical — the
    template/boilerplate-conversation detector (synthetic data and
    scripted flows produce thousands of structurally identical
    transcripts; exact text dedup misses them, this catches them).
    Canonical representative = min conv_id per signature, mirroring the
    reference's keep-first dedup before expensive sink work
    (RenameS3Utils.kt:52).

    Emits (conv_id, sig_md5, canonical_conv_id, is_dup).  Two shuffles
    (fold by conv_id, then window by signature hash) — both on bounded
    keys; the signature fold is sort_array(collect_list(...)) like the
    document render (A1), so no per-row Python anywhere.
    """
    parts: list[Column] = []
    for c in sig_cols:
        parts.append(F.coalesce(F.col(c), F.lit("")))
        parts.append(F.lit("~"))
    payload = F.concat(*parts[:-1]) if parts else F.lit("")
    st = F.struct(F.col(turn_col).alias("t"), payload.alias("p"))
    folded = df.groupBy(conv_col).agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(st)), lambda x: x["p"]
                ),
                "|",
            ).cast("binary")
        ).alias("sig_md5")
    )
    w = Window.partitionBy("sig_md5")
    return folded.select(
        F.col(conv_col),
        "sig_md5",
        F.min(conv_col).over(w).alias("canonical_conv_id"),
        (F.col(conv_col) != F.min(conv_col).over(w)).alias("is_dup"),
    )


def turn_loops(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Agent-loop detection: repeated identical (role, payload) turns
    inside one conversation.

    A stuck agent re-emits the same response; a broken scrape repeats a
    page.  Payload is coalesce(text, '') so repeating EMPTY turns of the
    same role (the commonest stuck-loop signature) are counted too.
    Emits per conversation: n_loop_turns (turns beyond the first
    occurrence of their payload) and max_repeat (the largest identical
    run's size).  Every conversation appears (0 / 1 for loop-free ones).

    Two groupBys, both keyed by conv_id (+ bounded payload) — the
    map-side-combinable two-phase count; no window, no self-join.
    """
    payload = F.concat(
        F.coalesce(F.col(role_col), F.lit("")),
        F.lit("~"),
        F.coalesce(F.col(text_col), F.lit("")),
    )
    per_payload = df.groupBy(F.col(conv_col), payload.alias("_p")).agg(
        F.count("*").alias("_c")
    )
    return per_payload.groupBy(conv_col).agg(
        F.sum(F.col("_c") - 1).alias("n_loop_turns"),
        F.max("_c").alias("max_repeat"),
    )


def clean_transcripts(
    df: DataFrame,
    budget: int,
    max_repeat_rate: float = 0.25,
    max_turn_repeat: int = 3,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    materialize: bool = False,
) -> DataFrame:
    """The composed transcript-prep pipeline: validation gate → structure
    dedup → loop filter → context-window truncation, in one plan.

    Keeps conversations that (a) pass the dialogue-structure gate
    (consecutive-same-role rate <= ``max_repeat_rate``), (b) are the
    canonical representative of their interaction-structure signature,
    and (c) never repeat one (role, payload) turn more than
    ``max_turn_repeat`` times; then truncates survivors to the longest
    whole-turn suffix within ``budget`` tokens.  Output is the
    training-ready turn table (all payload columns + n_tokens).

    Plan shape: every stage keys on conv_id, so the three gate
    aggregates and the final semi-joins all reuse one hash partitioning
    (AQE coalesces; the joins are conv-keyed, never corpus-row-keyed) —
    the same composition story as the documents-side clean_corpus.

    ``materialize`` (default False — composition stays lazy, the
    dedup-operator convention): the input is referenced by all three
    gates plus the truncation, and Spark's exchange-reuse does NOT
    collapse the four identical upstream subtrees (measured 4 scans /
    0 ReusedExchange on the CDC-fold input), so True localCheckpoints
    ``df`` once and the gates read executor-local blocks instead of
    re-running the upstream plan 4x. Execution-point callers (the
    catalog query, bench) opt in; see operators/dedup.py _maybe_ckpt
    for the executor-loss caveat.
    """
    if materialize:
        df = df.localCheckpoint(eager=True)
    alt = role_alternation(df, conv_col, turn_col).filter(
        F.col("n_role_repeats") <= F.col("n_turns") * max_repeat_rate
    )
    nodup = structure_dedup(df, conv_col, turn_col).filter(~F.col("is_dup"))
    noloop = turn_loops(df, conv_col).filter(
        F.col("max_repeat") <= max_turn_repeat
    )
    keep = (
        alt.select(conv_col)
        .join(nodup.select(conv_col), conv_col)
        .join(noloop.select(conv_col), conv_col)
    )
    return truncate_to_budget(
        df.join(keep, conv_col), budget, conv_col, turn_col
    )


def boilerplate_turns(
    df: DataFrame,
    min_convs: int = 3,
    conv_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """Canned-response detection: turn texts that recur across many
    DISTINCT conversations (scripted greetings, template refusals,
    capability blurbs) — the transcripts analogue of the documents-side
    cross-doc boilerplate scan, at turn granularity.  Emits
    (text, n_convs, n_turns) for texts seen in >= ``min_convs``
    conversations; downstream cleaning anti-joins turns against it.

    One groupBy on the text key (map-side combinable; count-distinct
    adds the standard expand) — no self-join, no window; hot texts are
    exactly what the scan is looking for and arrive pre-combined.
    """
    return (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(text_col)
        .agg(
            F.countDistinct(conv_col).alias("n_convs"),
            F.count("*").alias("n_turns"),
        )
        .filter(F.col("n_convs") >= min_convs)
    )


def tool_usage(
    df: DataFrame,
    conv_col: str = "conv_id",
    tool_col: str = "tool",
    text_col: str = "text",
) -> DataFrame:
    """Per-tool usage rollup over the transcripts table.

    Emits per tool (NULL rendered 'none'): n_turns, n_convs (exact
    distinct), avg_tokens (6-dp).  One groupBy on a tiny key domain —
    map-side combine collapses it before the shuffle; countDistinct adds
    the standard expand-aggregate, still bounded by |tools| x |convs|.
    """
    toks = estimated_tokens(F.col(text_col))
    return df.groupBy(
        F.coalesce(F.col(tool_col), F.lit("none")).alias("tool")
    ).agg(
        F.count("*").alias("n_turns"),
        F.countDistinct(conv_col).alias("n_convs"),
        F.round(F.avg(toks), 6).alias("avg_tokens"),
    )


def train_eval_split(
    df: DataFrame,
    eval_pct: int = 5,
    conv_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic conversation-level train/eval split — the hold-out
    assignment every fine-tuning run needs, made replay-stable so a
    re-ingest never leaks eval conversations into train.

    split = 'eval' iff hash64(conv_id) % 100 < eval_pct. Hashing the KEY
    (never a row attribute) keeps whole conversations together; md5-based
    like every sampler here, so the DuckDB oracle reproduces the exact
    assignment. One conv-keyed groupBy (the table's natural partitioning
    key) emitting per-conv turn/token totals for mixture accounting.
    """
    from .dedup import hash64

    h = hash64(F.col(conv_col).cast("string"))
    return (
        df.groupBy(conv_col)
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(estimated_tokens(F.col(text_col))).alias("n_tokens"),
        )
        .select(
            conv_col,
            "n_turns",
            "n_tokens",
            F.when(h % 100 < eval_pct, F.lit("eval"))
            .otherwise(F.lit("train"))
            .alias("split"),
        )
    )


def scrub_turns(
    df: DataFrame,
    scrub_roles: tuple[str, ...],
    patterns: dict[str, str],
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Role-aware PII scrubbing over transcript turns: only turns whose
    role is in ``scrub_roles`` are redacted (user-contributed content
    carries PII risk; assistant/tool output is the model's own and is
    left bit-identical for replay equality). ``patterns`` maps
    replacement token -> regex (Java∩RE2 dialect, the docs_pii_scrub
    contract).

    Pure narrow projection — zero shuffle, stays in whole-stage codegen;
    n_redactions counts matches BEFORE replacement so audit totals
    survive the scrub.
    """
    in_scope = F.col(role_col).isin(*scrub_roles) & F.col(text_col).isNotNull()
    scrubbed = F.col(text_col)
    n_red = F.lit(0)
    for token in sorted(patterns):
        rx = patterns[token]
        # audit counts are against the ORIGINAL text (what was redacted),
        # not the partially-scrubbed intermediate
        n_red = n_red + F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(rx), F.lit(0))
        )
        scrubbed = F.regexp_replace(scrubbed, rx, token)
    return df.select(
        *[c for c in df.columns if c != text_col],
        F.when(in_scope, scrubbed).otherwise(F.col(text_col)).alias(text_col),
        F.when(in_scope, n_red).otherwise(F.lit(0))
        .cast("int")
        .alias("n_redactions"),
    )
