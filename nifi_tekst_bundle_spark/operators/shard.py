"""Balanced output sharding — assign every row a shard id so each shard
carries ~``target_weight`` of a weight column (token counts), while
preserving a global order column. This is the "pack the cleaned corpus
into equal-token training shards" step of an LLM data pipeline, and the
positional-packing analogue of the reference's ordered page assignment
(ReorderFiles.kt:132-136: positional index -> zero-padded page number),
re-expressed as a weight-balanced prefix sum.

Scale design — why not one window?  ``sum(w) OVER (ORDER BY id)`` with no
PARTITION BY collapses the whole table into a single sorted partition:
the classic scale-killer (fine at 60k rows, dead at 10^10). Instead we
run the textbook distributed prefix sum:

  1. chunk rows by ``floor(order / ids_per_chunk)`` — chunks are
     contiguous runs of the global order, so prefix sums compose;
  2. per-chunk totals via one map-side-combinable groupBy
     (``n_chunks = id_range / ids_per_chunk`` rows);
  3. the driver folds the sorted chunk totals into EXCLUSIVE prefix
     offsets — bounded metadata, the same class as the lake layer's
     touched-bucket collects (at 10^10 ids and ids_per_chunk=10^6 this
     is 10^4 tiny rows, never event data);
  4. broadcast the offsets back and finish with a within-chunk window
     cumsum — every window partition holds at most ``ids_per_chunk``
     rows, so no executor ever sorts more than one chunk.

``shard_id = floor(exclusive_global_cumsum / target_weight)`` is a pure
function of the data, so replays and both engines of an oracle compare
agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import hash64


def global_offsets(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    ids_per_chunk: int = 4096,
    out_col: str = "_gofs",
) -> DataFrame:
    """Add ``out_col``: the EXCLUSIVE global running total of
    ``weight_col`` in ``order_col`` order (row i's offset = sum of all
    earlier rows' weights), via the distributed two-phase prefix sum
    described in the module docstring. This is the shared engine under
    both ``balanced_shards`` (shard = offset div target) and
    ``pack_sequences`` (sequence = token-offset div context length)."""
    base = df.withColumn(
        "_chunk", F.floor(F.col(order_col) / F.lit(ids_per_chunk)).cast("long")
    )
    # bounded driver-side metadata: one row per chunk, never event data
    totals = base.groupBy("_chunk").agg(
        F.sum(F.col(weight_col).cast("long")).alias("_w")
    ).collect()
    offsets, running = [], 0
    for r in sorted(totals, key=lambda r: r["_chunk"]):
        offsets.append((int(r["_chunk"]), running))
        running += int(r["_w"])
    off_df = df.sparkSession.createDataFrame(
        offsets, schema="_chunk long, _offset long"
    )
    w = Window.partitionBy("_chunk").orderBy(order_col)
    cum_excl = F.sum(F.col(weight_col).cast("long")).over(w) - F.col(weight_col)
    return (
        base.join(F.broadcast(off_df), "_chunk")
        .withColumn(out_col, (F.col("_offset") + cum_excl).cast("long"))
        .drop("_chunk", "_offset")
    )


def balanced_shards(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    target_weight: int,
    ids_per_chunk: int = 4096,
    out_col: str = "shard_id",
) -> DataFrame:
    """Add ``out_col``: the 0-based shard index under a running-total
    packing of ``weight_col`` in ``order_col`` order.

    ``order_col`` must be unique and non-negative (a doc id / lsn);
    ``weight_col`` must be a non-negative integral weight. A shard may
    overshoot ``target_weight`` by at most one row's weight — the same
    greedy packing a single-threaded writer would produce, which is what
    makes the result order-independent and oracle-checkable.
    """
    return (
        global_offsets(df, order_col, weight_col, ids_per_chunk)
        .withColumn(
            out_col,
            F.floor(F.col("_gofs") / F.lit(target_weight)).cast("int"),
        )
        .drop("_gofs")
    )


def shuffle_positions(
    df: DataFrame,
    id_col: str,
    n_shards: int = 16,
    salt: str = "shuffle",
    out_shard: str = "shard_id",
    out_pos: str = "pos",
) -> DataFrame:
    """Deterministic corpus shuffle (the pre-training "shuffle then
    shard" step): every row gets a pseudo-random but fully replayable
    slot — ``out_shard`` = keyed md5 of ``id_col`` mod ``n_shards``,
    ``out_pos`` = rank of that md5 WITHIN the shard (ties by id). Windows
    are partitioned by shard, never global: size ``n_shards`` to the
    cluster (16 on the fixture, thousands at 100 TB) and no executor
    sorts more than one shard. ``salt`` reshuffles between epochs without
    touching the data. Replayability rule per the reference's
    deterministic page ordering (ReorderFiles.kt:132-136)."""
    # inlines the hash64 oracle idiom (cf. dedup.hash64) on purpose: the
    # ONE md5 digest here is shared between the shard assignment (60-bit
    # prefix) and the within-shard ordering key (full hex) — routing
    # through hash64 would hash every id twice
    hkey = F.md5(
        F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))
        .cast("binary")
    )
    h = df.select(
        F.col(id_col),
        hkey.alias("_hkey"),
        (
            F.conv(F.substring(hkey, 1, 15), 16, 10).cast("long")
            % F.lit(int(n_shards))
        )
        .cast("int")
        .alias(out_shard),
    )
    w = Window.partitionBy(out_shard).orderBy("_hkey", id_col)
    return h.select(
        id_col,
        out_shard,
        (F.row_number().over(w) - 1).cast("long").alias(out_pos),
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    ctx_len: int,
    ids_per_chunk: int = 4096,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the "pack the tokenized corpus
    into fixed ``ctx_len``-token training sequences" step of an LLM data
    pipeline: documents are concatenated in ``order_col`` order and the
    token stream is cut every ``ctx_len`` tokens, so a document may span
    several sequences and a sequence usually holds several documents (the
    standard concat-then-chunk regime; no padding, no discarded tail
    except the final partial sequence's slack).

    Returns one row per (sequence, document) overlap:

    - ``seq_id`` (int): 0-based index of the training sequence;
    - ``order_col``: the document key;
    - ``doc_tok_start`` / ``doc_tok_end`` (long): the half-open token
      range OF THE DOCUMENT that lands in this sequence;
    - ``seq_pos_start`` (long): where that slice begins INSIDE the
      sequence;
    - ``n_toks`` (long): slice length (= doc_tok_end - doc_tok_start).

    Scale shape: the global token offset comes from ``global_offsets``
    (two-phase distributed prefix sum — no single-partition window), and
    everything after it is a narrow projection + one explode whose
    fan-out per row is ceil(weight/ctx_len), i.e. proportional to output
    size. Zero-weight rows produce no sequence rows. Reference analogue:
    the ordered positional page layout of ReorderFiles.kt:132-136, lifted
    from page-per-file to token-budget packing.
    """
    ctx = F.lit(int(ctx_len))
    base = global_offsets(
        df.filter(F.col(weight_col) > 0),
        order_col,
        weight_col,
        ids_per_chunk,
    ).select(
        F.col(order_col),
        F.col(weight_col).cast("long").alias("_n"),
        F.col("_gofs").alias("_o"),
    )
    # a doc spanning tokens [o, o+n) touches sequences
    # floor(o/ctx) .. floor((o+n-1)/ctx); integer DIV keeps the math in
    # longs (no double rounding anywhere on the 10^10-token path)
    first = F.expr(f"_o DIV {int(ctx_len)}")
    last = F.expr(f"(_o + _n - 1) DIV {int(ctx_len)}")
    out = base.select(
        F.col(order_col),
        "_n",
        "_o",
        F.explode(F.sequence(first, last)).alias("_seq"),
    )
    return out.select(
        F.col("_seq").cast("int").alias("seq_id"),
        F.col(order_col),
        F.greatest(F.lit(0).cast("long"), F.col("_seq") * ctx - F.col("_o"))
        .alias("doc_tok_start"),
        F.least(F.col("_n"), (F.col("_seq") + 1) * ctx - F.col("_o"))
        .alias("doc_tok_end"),
        F.greatest(F.lit(0).cast("long"), F.col("_o") - F.col("_seq") * ctx)
        .alias("seq_pos_start"),
    ).withColumn(
        "n_toks", F.col("doc_tok_end") - F.col("doc_tok_start")
    )


def mixture_sample(
    df: DataFrame,
    budgets: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Token-budget data mixing: deterministically sample each source to
    its target token budget — the "mix 30% web, 20% code, ..." step that
    turns per-source corpora into a training mixture measured in TOKENS,
    not documents.

    Per source, documents are ordered by md5(id) (replay-stable
    pseudo-random, the stratified-sample convention) and the longest
    PREFIX whose cumulative token count fits ``budgets[source]`` is
    kept; sources absent from ``budgets`` are dropped (an explicit
    mixture spec — silence is exclusion, not pass-through). Emits the
    kept rows with ``cum_tokens`` so downstream audit can see how full
    each source's budget ran.

    Scale shape: ONE window partitioned by source (the same per-stratum
    sort as docs_stratified_sample — at 10^10 docs a dominant source is
    the skew case; AQE skew handling applies, and the two-phase chunked
    prefix sum above is the drop-in replacement if one source outgrows
    a partition). The budget lookup is a map LITERAL (bounded driver
    metadata, broadcast with the plan); try_element_at keeps unknown
    sources NULL → filtered, instead of erroring under ANSI mode.
    """
    entries: list[F.Column] = []
    for k in sorted(budgets):
        entries.append(F.lit(k))
        entries.append(F.lit(int(budgets[k])))
    bmap = F.create_map(*entries)
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    budget = F.try_element_at(bmap, F.col(source_col))
    return (
        df.select(
            F.col(id_col),
            F.col(source_col),
            F.col(tokens_col).cast("long").alias(tokens_col),
            F.sum(tokens_col).over(w).cast("long").alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= budget)
    )


# 2^60: the hash64 value space (15 hex digits of md5). A power of two, so
# dividing by it is exact scaling and u = (h+1)/2^60 lands in (0, 1] with
# identical IEEE rounding in every engine that casts int64->double.
_U_SCALE = float(1 << 60)


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement — priority
    sampling (Duffield–Lund–Thorup, CACM 2007): each row gets priority
    w / u with u uniform in (0,1], and the k highest-priority rows are the
    sample. Inclusion probability is proportional to weight in the tail,
    and the estimator w_hat = max(w, tau) (tau = the (k+1)-th priority)
    is unbiased for subset sums — the standard way to downsample a corpus
    while keeping long documents representable.

    u is derived from md5(id) (replay-stable like every sampler here,
    docs_shuffle / stratified convention): h in [0, 2^60) from 15 hex
    digits, u = (h+1)/2^60. All arithmetic is cast-then-divide — no
    transcendentals — so DuckDB reproduces the doubles bit-for-bit (the
    same reason lm.bigram_lm_score is log-free).

    Scale shape: a narrow projection plus TakeOrderedAndProject(k) — the
    global top-k never materializes a full sort (per-partition heaps, one
    k-row-per-partition reduce to the driver-side merge). No shuffle of
    the corpus itself.
    """
    h = hash64(F.col(id_col).cast("string"))
    u = (h + F.lit(1)).cast("double") / F.lit(_U_SCALE)
    pr = F.col(weight_col).cast("double") / u
    return (
        df.select(
            F.col(id_col),
            F.col(weight_col),
            pr.alias("priority"),
        )
        .orderBy(F.desc("priority"), F.col(id_col))
        .limit(int(k))
    )
