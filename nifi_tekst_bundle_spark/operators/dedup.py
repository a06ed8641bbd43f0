"""Deduplication operators for large-scale training-data pipelines.

The reference deduplicates change instructions before expensive sink ops
(distinctBy on normalized keys, RenameS3Utils.kt:52); these operators grow
that idea to document-level dedup at corpus scale:

- exact dedup: hash-groupBy (one shuffle, map-side combine)
- MinHash + LSH: shingle → minhash → band → bucket-join — candidate pairs
  only ever meet inside a band bucket, so the shuffle is bounded by bucket
  sizes, never O(n²)
- SimHash: 64-bit sign-aggregated token hashes, near-dups within Hamming
  radius via band-rotation buckets
- n-gram Jaccard verification of LSH candidates

Hash backends (``hash_mode``): every signature operator accepts
``hash_mode='production'`` (default) or ``'oracle'``.

- ``production`` hashes with Spark's native ``xxhash64`` — one JVM
  intrinsic per token/shingle, ~an order of magnitude cheaper than md5.
  At 100 TB the per-shingle hash is the dominant constant factor of every
  signature operator, so this is the mode a real pipeline runs.
- ``oracle`` hashes with an md5-prefix (F.md5 → first 15 hex chars →
  bigint) that a SQL oracle (DuckDB) reproduces bit-for-bit:
  ``('0x' || substr(md5(x),1,15))::INT64``. Used by the driver-checked
  CORRECTNESS queries, where signature VALUES (not just decisions) are
  hash-compared against DuckDB.

Both modes produce the same PLAN shape (narrow fold, no shuffle) and — on
the test fixture — the same near-dup *decisions* after Jaccard verify
(pinned by tests/test_dedup_similarity.py::test_hash_modes_agree_on_decisions);
only the signature bit patterns differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_MODES = ("production", "oracle")


def _check_mode(hash_mode: str) -> None:
    if hash_mode not in HASH_MODES:
        raise ValueError(
            f"hash_mode must be one of {HASH_MODES}, got {hash_mode!r}"
        )


def hash64(col: F.Column, hash_mode: str = "oracle") -> F.Column:
    """Deterministic 64-bit token hash.

    oracle: 60-bit md5 prefix reproducible in ANSI SQL as
    conv(substr(md5(x),1,15),16,10). production: native xxhash64
    (seed 42 — Spark's default), full 64 bits, JVM intrinsic."""
    _check_mode(hash_mode)
    if hash_mode == "production":
        return F.xxhash64(col)
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


# ------------------------------------------------------------ exact dedup


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest-id representative per exact text hash."""
    h = F.md5(F.col(text_col).cast("binary")).alias("text_hash")
    return (
        df.select(F.col(id_col), F.col(text_col), h)
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("dup_count"),
        )
    )


# ------------------------------------------------------------ shingling


def split_words(text_col: F.Column) -> F.Column:
    """The corpus tokenization convention shared by every shingle path."""
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def word_shingles_from(words: F.Column, k: int = 3) -> F.Column:
    """Array of word k-grams from a PRE-SPLIT word array.

    Hot-path callers must pass a NAMED column (select the split into an
    alias first): referencing an inlined split() expression here makes
    Catalyst re-evaluate the split regex inside every element_at of the
    HOF lambda — O(shingles·k) splits per doc, measured ~30× slower on
    the winnowing signature projection and ~3× on minhash signatures at
    sf0.1."""
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(k)]
            ),
        ),
    ).otherwise(F.array(F.concat_ws(" ", F.array_join(words, " "))))


def word_shingles(text_col: F.Column, k: int = 3) -> F.Column:
    """Array of word k-grams (space-joined), JVM-side via transform/sequence
    — the columnar analogue of a shingling loop. Convenience form for
    small/candidate-pruned inputs; hot paths should two-step through
    :func:`split_words` + :func:`word_shingles_from` (see there)."""
    return word_shingles_from(split_words(text_col), k)


# ------------------------------------------------------------ minhash


# Carter-Wegman universal-hash family over the Mersenne prime 2^31-1:
# minhash_i = min over shingles of (a_i * x + b_i) mod P, where x is the
# shingle's md5-derived base hash reduced mod P. One md5 per shingle total
# (the old formulation salted the md5 input per hash index — n_hashes md5
# evaluations per shingle, and md5 dominates the cost). A plain affine mix
# WITHOUT the mod would be monotonic in x — every hash index would pick the
# same shingle and the signature rows would be perfectly correlated; the
# mod-P wraparound is what de-correlates them. x < P and a < P keep
# a*x + b < 2^62, safely inside int64 in both Spark and DuckDB.
MH_P = 2147483647


def mh_consts(i: int) -> tuple[int, int]:
    """Deterministic (a_i, b_i) for hash index i — mirrored literally into
    the DuckDB oracle SQL (plans/catalog.py) so values match bit-for-bit."""
    return (
        (1103515245 * (i + 1) + 12345) % MH_P,
        (12820163 * (i + 1)) % MH_P,
    )


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 16, k: int = 3,
    hash_mode: str = "production",
) -> DataFrame:
    """One row per doc: minhash_0..n-1 columns.

    Plan shape: pure narrow projection — each signature is
    ``array_min(transform(base_hashes, mix_i))`` over the doc's own shingle
    array, so there is NO explode and NO shuffle (min is insensitive to
    duplicate shingles, so no dedup pass is needed either). At corpus scale
    this runs embarrassingly parallel over the scan; an earlier
    explode → groupBy formulation shuffled |shingles| rows per doc and
    measured ~5× slower at sf0.1.

    The expensive md5 runs once per shingle (the ``_mh_base`` projection);
    the per-index minhashes are cheap integer mixes of that base array.
    The two-step select keeps the base array as a named alias referenced
    n_hashes times, which CollapseProject leaves un-inlined (non-cheap
    expression, multiple references) — i.e. md5 is genuinely evaluated once.
    Measured same-session at sf0.1 (5000 docs, local[32], noop-sink full
    materialization, min of 3 interleaved trials): this base+mix form
    1.14 s vs the previous salted-md5-per-index form 2.84 s (~2.5×; the
    gap grows linearly with n_hashes since the old form paid one md5 per
    shingle per index). LSH bucket health is unchanged: at sf0.1 with
    n_hashes=4/n_bands=2 the band buckets max out at 8 docs, 705 candidate
    pairs total — the Carter-Wegman family is not degenerate.

    ``hash_mode='production'`` (default) hashes shingles with xxhash64
    (pmod-reduced into [0, P) — pmod, not %, because xxhash64 is signed);
    ``'oracle'`` uses the md5-prefix hash DuckDB reproduces bit-for-bit.
    Same plan, same mix constants; only the base-hash values differ.

    The word split is materialized as a named column before the shingle
    lambda (see word_shingles_from — an inlined split re-runs per
    element_at; this two-step measured 0.27 s vs 0.85 s at sf0.1).
    """
    _check_mode(hash_mode)
    wd = df.select(
        F.col(id_col), split_words(F.col(text_col)).alias("_wrd")
    )
    sh = word_shingles_from(F.col("_wrd"), k)
    base = F.transform(sh, lambda s: F.pmod(hash64(s, hash_mode), F.lit(MH_P)))
    hb = wd.select(F.col(id_col), base.alias("_mh_base"))
    def _mix(a: int, b: int):
        # separate factory: pyspark infers the HOF arity from the lambda's
        # parameter count, so defaulted captures (lambda x, a=a, b=b: ...)
        # would read as a 3-arg lambda and fail analysis
        return lambda x: (x * F.lit(a) + F.lit(b)) % F.lit(MH_P)

    cols = []
    for i in range(n_hashes):
        a, b = mh_consts(i)
        cols.append(
            F.array_min(F.transform(F.col("_mh_base"), _mix(a, b))).alias(
                f"minhash_{i}"
            )
        )
    return hb.select(F.col(id_col), *cols)


def lsh_bands(
    sig: DataFrame, id_col: str, n_hashes: int = 16, n_bands: int = 4,
    hash_mode: str = "production",
) -> DataFrame:
    """Band signatures: band_id ∈ [0, n_bands), band_hash = hash of the
    band's minhashes (md5 hex in oracle mode, xxhash64-as-string in
    production). Docs sharing (band_id, band_hash) are candidates."""
    _check_mode(hash_mode)
    rows = n_hashes // n_bands
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"minhash_{b * rows + r}") for r in range(rows)]
        joined = F.concat_ws("|", *[c.cast("string") for c in cols])
        bh = (
            F.xxhash64(joined).cast("string")
            if hash_mode == "production"
            else F.md5(joined)
        )
        bands.append(
            F.struct(F.lit(b).alias("band_id"), bh.alias("band_hash"))
        )
    return sig.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("band")
    ).select(id_col, "band.band_id", "band.band_hash")


def _maybe_ckpt(df: DataFrame, materialize: bool) -> DataFrame:
    """Gate for the intra-operator materialization points (ADVICE r3).

    ``materialize=True`` localCheckpoints (eager): multiply-referenced
    intermediates (band tables, candidate pairs) compute ONCE instead of
    once per reference — the right call when the result is consumed
    immediately and fully (the catalog queries and bench do this). The
    costs: (a) the operator triggers Spark jobs at COMPOSITION time, so
    explain-only callers pay real execution and downstream filters can no
    longer prune the checkpointed stages; (b) localCheckpoint blocks are
    executor-local and non-replicated — under executor loss or dynamic
    allocation the lineage is gone and the job fails unrecoverably.

    ``materialize=False`` (the default) keeps the plan fully lazy and
    declarative: composition is free, Catalyst sees the whole tree, and
    recovery/decommissioning work normally — at the price of recomputing
    the shared stages once per reference (2-3× for these operators). On a
    real cluster, callers wanting single-computation without the
    executor-loss caveat should persist(MEMORY_AND_DISK) the RESULT and
    unpersist at their own action boundary instead.
    """
    return df.localCheckpoint(eager=True) if materialize else df


def minhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    n_bands: int = 4,
    jaccard_threshold: float = 0.7,
    k: int = 3,
    hash_mode: str = "production",
    materialize: bool = False,
) -> DataFrame:
    """Candidate pairs from LSH buckets, verified by exact n-gram Jaccard.

    Returns (id_a, id_b, jaccard) with id_a < id_b. The verification join
    only touches docs that co-bucket — at corpus scale the candidate set is
    ~linear in corpus size for reasonable band settings.

    ``materialize`` — see :func:`_maybe_ckpt`: True computes each shared
    stage once (eager, executor-local blocks), False stays lazy.
    """
    _check_mode(hash_mode)
    sig = minhash_signature(df, id_col, text_col, n_hashes, k, hash_mode)
    # Materialize the band table before the self-join (materialize=True):
    # Catalyst does not reuse the exchange across the two aliased sides
    # (verified: 0 ReusedExchange in the executed plan), so without this
    # the whole shingle→hash→minhash pipeline — the expensive narrow
    # stage — runs TWICE, once per side. The band table is 2 tiny columns
    # × n_bands rows per doc; localCheckpoint (not persist) so the blocks
    # are released by the context cleaner when the DataFrame goes out of
    # scope rather than pinning executor storage until an unpersist
    # nobody downstream is positioned to call.
    bands = _maybe_ckpt(
        lsh_bands(sig, id_col, n_hashes, n_bands, hash_mode), materialize
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    # referenced three times below (id extraction + both verify sides);
    # without the checkpoint each reference re-runs the band self-join
    cand = _maybe_ckpt(cand, materialize)
    # Verify stage, candidate-pruned: semi-join the corpus down to docs
    # that appear in some candidate pair, shingle each such doc ONCE, then
    # join the (small) shingled table onto both pair sides. This moves
    # only candidate text (the earlier formulation joined the full
    # text-carrying corpus onto the pairs, which shuffled/broadcast the
    # whole corpus twice and shingled per PAIR row — measured 2.6 s vs
    # 0.4 s at sf0.1; at 100 TB the semi-prune is also the only shape that
    # doesn't ship the entire corpus into the verify join).
    ids = cand.select(
        F.explode(F.array("id_a", "id_b")).alias(id_col)
    ).distinct()
    raw_cand = _maybe_ckpt(
        df.select(F.col(id_col), F.col(text_col))
        .join(ids, id_col, "left_semi")
        .withColumn("_sh", word_shingles(F.col(text_col), k))
        .select(F.col(id_col), "_sh"),
        # consumed by both pair sides; bounded by candidate-doc count
        materialize,
    )
    j = (
        cand.join(
            raw_cand.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("sh_a")),
            "id_a",
        )
        .join(
            raw_cand.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("sh_b")),
            "id_b",
        )
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / F.greatest(F.col("uni"), F.lit(1)), 6),
        )
    )
    return j.filter(F.col("jaccard") >= jaccard_threshold).select(
        "id_a", "id_b", "jaccard"
    )


# ------------------------------------------------------- dedup clustering


def dedup_clusters(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b",
    max_iter: int = 25, hops_per_round: int = 2,
) -> DataFrame:
    """Connected components over a near-dup pair graph → (node, label)
    where ``label`` is the minimum id reachable through pairs — the
    cluster id a dedup pipeline keeps ONE representative per.

    Iterative min-label propagation: each hop is one equi-join (labels
    flow one edge) plus a min-aggregation; converges in graph-diameter
    hops, which for near-dup clusters is tiny (they are dense blobs, not
    long chains). ``hops_per_round`` hops run between checkpoints, so a
    round covers 2 hops for one materialization + one convergence probe —
    half the jobs of the hop-per-round formulation on chain graphs. Every
    round ends in localCheckpoint so the plan stays constant-size, and the
    driver-side convergence probe (limit(1) on changed labels) is O(1)
    rows. At corpus scale each hop shuffles the edge list once on node id
    — the standard large-graph CC shape (label propagation, no driver-side
    graph materialization).

    INHERENTLY EAGER: the convergence loop must run Spark jobs (the probe
    is an action), so calling this triggers execution — there is no lazy
    form of an iterate-until-converged algorithm. The checkpoint blocks
    are executor-local and non-replicated; under executor loss or dynamic
    allocation a round can fail unrecoverably — on a real cluster set
    spark.dynamicAllocation.enabled=false for the CC stage or swap the
    localCheckpoints for reliable checkpoint(…) against the cluster FS.
    """
    edges = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    )
    # materialize the (small) edge list once: every round joins against it,
    # and without the checkpoint each round — plus each convergence probe —
    # re-derives the whole upstream pair pipeline (LSH candidates + jaccard
    # verify when fed from minhash_near_dups; measured at sf0.1:
    # docs_dedup_clusters 8.8 s -> 3.9 s, clean_corpus 9.1 s -> 5.1 s)
    und = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    # empty edge set → empty labels; skip the loop (and its per-round jobs)
    if und.isEmpty():
        return labels
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        new_labels = labels
        for _h in range(hops_per_round):
            prop = und.join(
                new_labels.withColumnRenamed("node", "dst"), "dst"
            ).select(F.col("src").alias("node"), "label")
            new_labels = (
                new_labels.unionByName(prop)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
            )
        new_labels = new_labels.localCheckpoint(eager=True)
        # if hops_per_round hops changed nothing, one hop would have
        # changed nothing either (labels are monotonically non-increasing)
        # — so this probe detects exactly the usual fixpoint
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    # silent non-convergence would return WRONG cluster ids (and diverge
    # from the recursive-CTE oracle) — fail loudly instead; near-dup
    # components with diameter > max_iter*hops_per_round mean either
    # pathological data or a too-small max_iter
    raise RuntimeError(
        f"dedup_clusters did not converge within {max_iter} rounds of "
        f"{hops_per_round} hops; a component's diameter exceeds "
        "max_iter*hops_per_round — raise max_iter"
    )


# ------------------------------------------------ incremental (novelty) dedup


def incremental_near_dups(
    corpus: DataFrame,
    incoming: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 4,
    n_bands: int = 2,
    jaccard_threshold: float = 0.5,
    k: int = 3,
    hash_mode: str = "production",
    materialize: bool = False,
) -> DataFrame:
    """Novelty filter for continuous ingest: classify each ``incoming`` doc
    against the existing ``corpus`` WITHOUT re-deduplicating the corpus.

    This is the epoch shape of dedup in a crawling pipeline (and the CDC
    analogue of the reference's dedup-before-apply, RenameS3Utils.kt:52):
    each micro-batch must be checked against everything already ingested,
    so the corpus side is only ever touched through (a) an equi-join on
    its exact-hash column and (b) an equi-join on its LSH band table —
    both of which are precomputable, incrementally maintainable signature
    tables at 100 TB (this function derives them inline because the
    fixture is small; the plan shape is identical either way). The
    incoming side is one epoch — small — so both joins are broadcast-
    eligible and AQE picks that up; the corpus is never self-joined and
    never collected.

    Returns one row per incoming doc:
      (id, verdict, match_id, jaccard)
    - verdict='exact': identical text bytes exist in the corpus;
      match_id = lowest such corpus id; jaccard NULL (trivially 1).
    - verdict='near' : no exact twin, but an LSH band collision with a
      corpus doc whose verified k-gram Jaccard >= threshold; match_id =
      the best match (highest jaccard, ties to lowest corpus id).
    - verdict='novel': neither — the doc a training pipeline keeps.
    - verdict='invalid': the incoming doc's text is NULL. A NULL can never
      match anything (md5(NULL)=NULL, shingles of NULL=NULL), so without
      this verdict a caller feeding raw micro-batches would keep null docs
      as 'novel' training data (ADVICE r3); route 'invalid' rows to a dead
      letter instead. match_id and jaccard are NULL.

    ``hash_mode``/``materialize``: see module docstring / _maybe_ckpt.
    """
    _check_mode(hash_mode)
    ic = F.col(id_col)
    # null-text rows never enter the signature pipelines (wasted hashing,
    # and every downstream join would drop them anyway)
    incoming_t = incoming.filter(F.col(text_col).isNotNull())
    corpus_t = corpus.filter(F.col(text_col).isNotNull())
    exact_hash = (
        (lambda c: F.xxhash64(c).cast("string"))
        if hash_mode == "production"
        else (lambda c: F.md5(c.cast("binary")))
    )
    # exact twins: one hash equi-join, lowest corpus id per incoming doc
    in_h = incoming_t.select(
        ic.alias("_in_id"), exact_hash(F.col(text_col)).alias("_h")
    )
    co_h = corpus_t.select(
        ic.alias("_co_id"), exact_hash(F.col(text_col)).alias("_h")
    )
    exact = (
        in_h.join(co_h, "_h")
        .groupBy("_in_id")
        .agg(F.min("_co_id").alias("exact_match_id"))
    )

    # LSH candidates: incoming bands ⋈ corpus bands on (band_id, band_hash)
    in_sig = minhash_signature(incoming_t, id_col, text_col, n_hashes, k, hash_mode)
    co_sig = minhash_signature(corpus_t, id_col, text_col, n_hashes, k, hash_mode)
    in_bands = lsh_bands(in_sig, id_col, n_hashes, n_bands, hash_mode).select(
        F.col(id_col).alias("_in_id"), "band_id", "band_hash"
    )
    co_bands = lsh_bands(co_sig, id_col, n_hashes, n_bands, hash_mode).select(
        F.col(id_col).alias("_co_id"), "band_id", "band_hash"
    )
    cand = _maybe_ckpt(
        in_bands.join(co_bands, ["band_id", "band_hash"])
        .select("_in_id", "_co_id")
        .distinct(),
        # referenced three times (both id prunes + the verify join)
        materialize,
    )
    # verify candidates only, candidate-pruned like minhash_near_dups:
    # semi-join each side down to candidate-touched docs, shingle each doc
    # ONCE, join the small shingled tables onto the pairs — only candidate
    # text ever moves
    in_sh = (
        incoming_t.select(ic.alias("_in_id"), F.col(text_col).alias("_t"))
        .join(cand.select("_in_id").distinct(), "_in_id", "left_semi")
        .select("_in_id", word_shingles(F.col("_t"), k).alias("_sh_in"))
    )
    co_sh = (
        corpus_t.select(ic.alias("_co_id"), F.col(text_col).alias("_t"))
        .join(cand.select("_co_id").distinct(), "_co_id", "left_semi")
        .select("_co_id", word_shingles(F.col("_t"), k).alias("_sh_co"))
    )
    j = (
        cand.join(in_sh, "_in_id")
        .join(co_sh, "_co_id")
        .withColumn(
            "_jac",
            F.round(
                F.size(F.array_intersect("_sh_in", "_sh_co"))
                / F.greatest(
                    F.size(F.array_union("_sh_in", "_sh_co")), F.lit(1)
                ),
                6,
            ),
        )
        .filter(F.col("_jac") >= jaccard_threshold)
    )
    w = Window.partitionBy("_in_id").orderBy(
        F.desc("_jac"), F.asc("_co_id")
    )
    near = (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("_in_id", F.col("_co_id").alias("near_match_id"),
                F.col("_jac").alias("near_jaccard"))
    )

    base = incoming.select(
        ic.alias("_in_id"), F.col(text_col).isNull().alias("_null_text")
    )
    out = (
        base.join(exact, "_in_id", "left")
        .join(near, "_in_id", "left")
        .select(
            F.col("_in_id").alias(id_col),
            F.when(F.col("_null_text"), F.lit("invalid"))
            .when(F.col("exact_match_id").isNotNull(), F.lit("exact"))
            .when(F.col("near_match_id").isNotNull(), F.lit("near"))
            .otherwise(F.lit("novel"))
            .alias("verdict"),
            F.when(
                F.col("exact_match_id").isNotNull(), F.col("exact_match_id")
            )
            .otherwise(F.col("near_match_id"))
            .alias("match_id"),
            F.when(
                F.col("exact_match_id").isNull(), F.col("near_jaccard")
            ).alias("jaccard"),
        )
    )
    return out


# ------------------------------------------------------------ simhash


# SQL fragments computing hash64 of lambda variable `t` (identical to the
# hash64() Column builder above — kept in SQL form for use inside
# higher-order-function lambdas). oracle: md5-prefix, DuckDB-reproducible;
# production: native xxhash64 intrinsic (the 100-TB mode — md5 per token
# was the dominant constant factor of the signature scan).
_HASH64_SQL = {
    "oracle": "CAST(conv(substr(md5(CAST(t AS BINARY)), 1, 15), 16, 10) AS BIGINT)",
    "production": "xxhash64(t)",
}


def simhash64(
    df: DataFrame, id_col: str, text_col: str, hash_mode: str = "production"
) -> DataFrame:
    """64-bit SimHash per doc: per-token 60-bit hashes, sign-summed per bit.

    Pure narrow projection — the sign-sum folds over the row's own token
    array (hash each token once, update a 60-long ±1 accumulator via
    index-aware ``transform``, then pack sign bits), so there is NO explode
    and NO shuffle; at corpus scale it runs embarrassingly parallel over
    the scan.

    Formulation choice, measured head-to-head in one session at sf0.1
    (5000 docs, local[32], min of 3 trials, bit-identical outputs):
    this index-aware transform fold 0.26 s; the previous
    zip_with(acc, sequence(0,59)) fold 0.36 s (the per-token sequence()
    materialization is pure allocator overhead); explode → 60-conditional-
    sum groupBy 1.00 s (row expansion + shuffle). An earlier docstring
    claimed ~6× for fold-vs-explode from a noisier cross-session compare —
    the honest same-session gap is ~4× (and ~2.8× for the old fold).

    NULL-text rows are dropped (explicit NULL guard on the token-hash
    array), matching the explode→groupBy formulation and the SQL oracle's
    unnest, both of which never emit a group for a NULL token array.

    ``hash_mode='production'`` (default) hashes tokens with xxhash64;
    ``'oracle'`` with the DuckDB-reproducible md5 prefix. Sign bits use
    token-hash bits 0..59 in both modes (xxhash64 is signed 64-bit but
    shiftright+mask extracts low bits identically).

    Formulation (r4 rework, measured same-session at sf0.1, 5000 docs,
    local[32], min of 3 noop-sink trials, bit-identical outputs): 60
    INDEPENDENT per-bit folds over a shared token-hash array — oracle
    0.93 s, production 0.71 s — vs the r3 single fold that rebuilt a
    60-long ±1 accumulator array per token (oracle 1.47 s, production
    1.35 s). The r3 form's cost was the per-token array allocation, not
    the hash (xxhash64 saved only ~8% there); per-bit folds are plain
    integer adds with zero allocation. The token-hash array is a named
    multi-referenced alias, so CollapseProject leaves it un-inlined and
    each token hashes ONCE, not 60× (verified: oracle mode got faster,
    which md5×60 would make impossible).
    """
    _check_mode(hash_mode)
    hashes = F.expr(
        f"transform(split(lower(trim({text_col})), '\\\\s+'),"
        f" t -> {_HASH64_SQL[hash_mode]})"
    )
    d = df.select(F.col(id_col), hashes.alias("_h"))
    total = None
    for b in range(60):
        s = F.expr(
            f"aggregate(_h, CAST(0 AS BIGINT),"
            f" (acc, h) -> acc + (shiftright(h, {b}) & 1) * 2 - 1)"
        )
        bit = F.when(s > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        total = bit if total is None else total + bit
    sim = F.when(F.col("_h").isNull(), F.lit(None).cast("long")).otherwise(total)
    return d.select(F.col(id_col), sim.alias("simhash")).where(
        F.col("simhash").isNotNull()
    )


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, n_bands: int = 4,
    hash_mode: str = "production", max_hamming: int | None = None,
) -> DataFrame:
    """Near-dup candidates: docs sharing any 15-bit simhash band (catches
    Hamming distance < n_bands by pigeonhole).

    With ``max_hamming`` set, the band-bucket candidates are VERIFIED by
    exact Hamming distance (bit_count of xor — one JVM intrinsic per
    candidate pair, no re-scan of text: the simhashes ride along on the
    band rows) and the result gains a ``hamming`` column. This is the
    same candidates→verify shape as minhash_near_dups' Jaccard stage:
    the expensive exact check runs only inside buckets."""
    sim = simhash64(df, id_col, text_col, hash_mode)
    width = 60 // n_bands
    bands = sim.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "simhash", "band.band_id", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = a.join(
        b,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    if max_hamming is None:
        return cand.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        ).distinct()
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("int")
    return (
        cand.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------------------- embedding near-dup


def embedding_near_dups(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95,
    n_planes: int = 8, dims: int | None = None,
) -> DataFrame:
    """Near-duplicates by embedding cosine, LSH-bucketed by random
    hyperplane signs so the pairwise check never goes O(n²).

    Hyperplane weights are hash-derived (deterministic, no RNG state):
    w(p, d) ∈ [-1, 1) from md5(p|d).
    """
    from .similarity import cosine, hyperplane_signature

    sigs = df.select(
        F.col(id_col), F.col(vec_col),
        hyperplane_signature(F.col(vec_col), n_planes, dims=dims).alias("sig"),
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    pairs = a.join(
        b,
        (F.col("a.sig") == F.col("b.sig"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6).alias(
            "cos"
        ),
    )
    return pairs.filter(F.col("cos") >= threshold)


def embedding_near_dups_banded(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_tables: int = 4,
    planes_per_table: int = 8,
    bucket_cap: int | None = None,
    stats: dict | None = None,
    dims: int | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Banded (multi-table) hyperplane LSH near-dup — the 100 TB path.

    OR-amplification: ``n_tables`` independent signatures over disjoint
    plane ranges; a pair is a candidate if it shares the bucket of ANY
    table (recall grows ≈ 1-(1-p^r)^b vs the single-table p^r), then exact
    cosine verifies. The single-table variant (embedding_near_dups) keeps
    one 2^planes bucketing — at billions of vectors its intra-bucket pair
    count is still ~n²/2^planes; here ``bucket_cap`` bounds the worst
    bucket outright: buckets holding more than cap rows are DROPPED from
    candidate generation (deterministically — the SQL oracle reproduces the
    same drops), so the self-join cost is ≤ cap per bucket no matter how
    pathological the data. Pass ``stats`` (a dict) to have kept/dropped
    bucket counts recorded — silent truncation reads as full coverage, so
    surface what was skipped.

    Plan shape: signatures are a narrow projection; ONE shuffle on
    (table_id, sig) covers both the window count and the self-join;
    candidate pairs dedupe before the vector join, so each pair's cosine
    is computed once.

    ``materialize`` — see :func:`_maybe_ckpt`: True computes each shared
    stage once via eager localCheckpoint (executor-local blocks; explain-
    only callers pay real execution), False stays lazy and recomputes the
    signature scan once per self-join side. Passing ``stats`` is itself an
    eager request (the kept/dropped counts are an action), so the bucketed
    scan is always checkpointed in that mode regardless of ``materialize``.
    """
    from .similarity import cosine, hyperplane_signature

    sigs = df.select(
        F.col(id_col),
        *[
            hyperplane_signature(
                F.col(vec_col), planes_per_table,
                plane_offset=t * planes_per_table, dims=dims,
            ).alias(f"sig_{t}")
            for t in range(n_tables)
        ],
    )
    stacked = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_id"),
                        F.col(f"sig_{t}").alias("sig"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("b"),
    ).select(id_col, "b.table_id", "b.sig")
    if bucket_cap is not None:
        w = Window.partitionBy("table_id", "sig")
        counted = stacked.withColumn("_bc", F.count("*").over(w))
        if stats is not None:
            # materialize the bucketed scan so the stats action and the main
            # pipeline share ONE signature computation (without it the
            # n_tables × hyperplane scan — the expensive stage — runs once
            # for stats and again for the candidate join). localCheckpoint,
            # NOT persist: checkpoint blocks are released by the context
            # cleaner when the returned plan is garbage collected, whereas a
            # persist here would pin the scan in executor storage until an
            # unpersist nobody downstream is positioned to call (repeated
            # calls — bench trials — would accumulate cached copies)
            counted = counted.localCheckpoint(eager=True)  # stats ⇒ eager
            row = (
                counted.select("table_id", "sig", "_bc")
                .distinct()
                .agg(
                    F.sum((F.col("_bc") > bucket_cap).cast("int")).alias("d"),
                    F.sum((F.col("_bc") <= bucket_cap).cast("int")).alias("k"),
                )
                .first()
            )
            stats["dropped_buckets"] = int(row["d"] or 0)
            stats["kept_buckets"] = int(row["k"] or 0)
        stacked = counted.filter(F.col("_bc") <= bucket_cap).drop("_bc")
    if not (bucket_cap is not None and stats is not None):
        # the self-join reads stacked through TWO aliases — without a
        # materialization the n_tables × hyperplane signature scan (the
        # expensive stage) runs once per side; in stats mode `counted` is
        # already checkpointed above and the per-side filter is cheap
        stacked = _maybe_ckpt(stacked, materialize)
    a, b = stacked.alias("a"), stacked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    # referenced three times below (id prune + both verify sides)
    cand = _maybe_ckpt(cand, materialize)
    # cosine verify, candidate-pruned (same shape as the text verify in
    # minhash_near_dups): semi-join the vector table down to candidate-
    # touched ids so only candidate vectors ever move into the join
    ids = cand.select(
        F.explode(F.array("id_a", "id_b")).alias(id_col)
    ).distinct()
    vecs = _maybe_ckpt(
        df.select(F.col(id_col), F.col(vec_col)).join(ids, id_col, "left_semi"),
        materialize,  # consumed by both pair sides
    )
    pairs = (
        cand.join(
            vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")),
            "id_a",
        )
        .join(
            vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cos"),
        )
    )
    return pairs.filter(F.col("cos") >= threshold)


# ------------------------------------------------------- span-level dedup


def span_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_docs: int = 2,
    hash_mode: str = "production",
) -> DataFrame:
    """Substring/paragraph-level dedup: find word spans REPEATED ACROSS
    documents — the training-data step that removes boilerplate paragraphs
    and cross-crawl duplicated passages that doc-level dedup (exact /
    MinHash / SimHash) cannot see because the host documents differ.

    Returns one row per maximal duplicated span:
      (id, span_start, span_end, n_grams)
    where span_start/span_end are 0-based word indices (inclusive) and
    n_grams counts the duplicated k-grams merged into the span. A caller
    removes spans with a word-level slice; docs shorter than k words have
    no k-grams and never appear.

    Algorithm (the distributed analogue of suffix-array repeated-substring
    removal, on word k-gram granularity):
      1. per doc, hash every word k-gram ONCE (narrow projection — one
         hash per gram, positions via posexplode);
      2. grams appearing in >= min_docs DISTINCT docs are duplicated —
         two map-side-combinable aggregations on the gram hash, the only
         cross-doc shuffle;
      3. per doc, semi-join keeps positions whose gram is duplicated, and
         one window pass (partitioned by doc — second and last shuffle)
         merges overlapping gram intervals [p, p+k-1] into maximal spans:
         a gap > k between consecutive duplicated positions breaks a span.

    At 100 TB: step 2 shuffles one (hash, id) pair per gram — bounded by
    corpus token count, partial-aggregated map-side; nothing is ever
    self-joined and no candidate set is quadratic. The gram table is
    re-derived (cheap narrow hash) rather than checkpointed, so the
    operator composes lazily.

    Reference analogue: dedup-before-apply (RenameS3Utils.kt:52) lifted
    from whole-item identity to intra-document spans.
    """
    _check_mode(hash_mode)
    # named word column before the gram lambda — an inlined split() would
    # re-run the regex per element_at inside the HOF (O(grams·k) splits
    # per doc; see the same fix in winnow_fingerprints, measured ~30×)
    wd = df.select(
        F.col(id_col),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_w"),
    ).filter(F.size("_w") >= k)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ",
        *[F.element_at(F.col("_w"), (i + j + 1).cast("int")) for j in range(k)],
    )
    gh_arr = F.transform(
        F.sequence(F.lit(0), F.size("_w") - k),
        lambda i: hash64(gram(i), hash_mode),
    )  # docs shorter than k words are filtered above (no k-grams)
    grams = wd.select(
        F.col(id_col), F.posexplode(gh_arr).alias("pos", "_gh")
    )
    repeated = (
        grams.select("_gh", id_col)
        .distinct()  # within-doc repeats count once toward min_docs
        .groupBy("_gh")
        .count()
        .filter(F.col("count") >= min_docs)
        .select("_gh")
    )
    dup_pos = grams.join(repeated, "_gh", "left_semi").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos", 1).over(w) > k, F.lit(1)
    ).otherwise(F.lit(0))
    islands = dup_pos.withColumn("_brk", brk).withColumn(
        "_island",
        F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy(id_col, "_island")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("int").alias("span_end"),
            F.count("*").cast("bigint").alias("n_grams"),
        )
        .drop("_island")
    )


def strip_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Apply :func:`span_dedup` output: cut the duplicated word spans out
    of each document, producing the cleaned text a training pipeline keeps.

    Returns (id, clean_text, n_removed). clean_text is whitespace-
    normalized lowercase (the same normalization spans were computed
    over — word indices only line up in that space); n_removed counts
    words cut. Docs without spans pass through (normalized) with
    n_removed = 0.

    Plan: spans collapse to one small struct array per doc (collect_list
    — order-insensitive, only existence is tested), LEFT-join onto the
    corpus on id, then a pure narrow index-aware filter fold per row.
    One shuffle (the join); at 100 TB the span side is a tiny fraction of
    the corpus and broadcast-eligible.
    """
    sp = spans.groupBy(F.col(id_col)).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("_spans")
    )
    j = df.select(F.col(id_col), F.col(text_col)).join(sp, id_col, "left")
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    covered = lambda i: F.exists(  # noqa: E731
        F.col("_spans"), lambda s: (i >= s["s"]) & (i <= s["e"])
    )
    kept = F.filter(words, lambda w, i: ~covered(i))
    cleaned = F.when(
        F.col("_spans").isNull(), F.array_join(words, " ")
    ).otherwise(F.array_join(kept, " "))
    n_removed = F.when(F.col("_spans").isNull(), F.lit(0)).otherwise(
        F.size(words) - F.size(kept)
    )
    return j.select(
        F.col(id_col),
        cleaned.alias("clean_text"),
        n_removed.cast("bigint").alias("n_removed"),
    )


# ------------------------------------------------------------ bloom filter


def bloom_novelty(
    reference: DataFrame,
    incoming: DataFrame,
    id_col: str,
    text_col: str,
    m: int = 4096,
    k: int = 3,
    hash_mode: str = "production",
) -> DataFrame:
    """Bloom-filter novelty check of ``incoming`` documents against a
    ``reference`` corpus — the constant-memory cross-shard exact-dedup
    primitive (a new crawl snapshot probed against everything already
    ingested, without shuffling the reference corpus per batch).

    Each document's text hashes to ``k`` bit positions in [0, m). The
    filter is materialized RELATIONALLY as the distinct-position table of
    the reference side — at most ``m`` rows REGARDLESS of reference size,
    so the probe join is always broadcastable: the incoming scan never
    shuffles and the reference collapses to bounded state, exactly the
    guarantee a bitset gives (a deployment packing the positions into
    m/8 bytes changes the representation, not the plan shape). False
    positives are inherent Bloom semantics and fully DETERMINISTIC here:
    both engines derive positions from the same md5 prefixes (oracle
    mode: position_j = ('0x'||substr(md5(text), 1+8j, 8))::int % m), so
    the oracle reproduces every collision bit-for-bit. The default is
    ``'production'`` like every other signature operator in this module
    (xxhash64(text, j) — one JVM intrinsic per probe instead of md5);
    pass ``hash_mode='oracle'`` explicitly for DuckDB bit-parity (the
    driver-checked ``docs_bloom_dedup`` row does).

    Returns (id_col, n_hits, verdict): verdict = 'seen' iff all k
    positions are set — maybe-duplicate (send to exact verification);
    'novel' is EXACT (guaranteed not in the reference). Null-text rows
    verdict 'invalid' (cf. incremental_near_dups).
    """
    _check_mode(hash_mode)
    # the digest-width ceiling is an oracle-mode constraint only:
    # production derives positions from xxhash64(text, j), any k works
    if hash_mode == "oracle" and k * 8 > 32:
        raise ValueError("k*8 hex chars must fit one md5 digest in oracle mode")

    def positions(col: F.Column) -> list[F.Column]:
        if hash_mode == "production":
            return [
                F.pmod(F.xxhash64(col, F.lit(j)), F.lit(m)).cast("int")
                for j in range(k)
            ]
        digest = F.md5(col.cast("binary"))
        return [
            F.pmod(
                F.conv(F.substring(digest, 1 + 8 * j, 8), 16, 10).cast("long"),
                F.lit(m),
            ).cast("int")
            for j in range(k)
        ]

    ref_bits = (
        reference.filter(F.col(text_col).isNotNull())
        .select(F.explode(F.array(*positions(F.col(text_col)))).alias("bit"))
        .distinct()
        .withColumn("set_", F.lit(1))
    )
    probes = incoming.select(
        F.col(id_col),
        F.col(text_col).isNull().alias("is_null"),
        F.explode(
            F.array(*positions(F.coalesce(F.col(text_col), F.lit(""))))
        ).alias("bit"),
    )
    hits = (
        probes.join(F.broadcast(ref_bits), ["bit"], "left")
        .groupBy(id_col)
        .agg(
            F.max("is_null").alias("is_null"),
            F.sum(F.coalesce(F.col("set_"), F.lit(0)))
            .cast("int")
            .alias("n_hits"),
        )
    )
    verdict = (
        F.when(F.col("is_null"), F.lit("invalid"))
        .when(F.col("n_hits") == k, F.lit("seen"))
        .otherwise(F.lit("novel"))
    )
    return hits.select(F.col(id_col), "n_hits", verdict.alias("verdict"))


# -------------------------------------------- incremental index maintenance


def maintain_minhash_index(
    old_index: DataFrame,
    changed_ids: DataFrame,
    new_state: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    k: int = 3,
    hash_mode: str = "production",
) -> DataFrame:
    """Incrementally maintain a MinHash signature index under CDC: given
    the index built over the OLD corpus state, the set of ids the change
    feed touched, and the NEW corpus state, produce the index of the new
    state WITHOUT re-hashing the untouched corpus.

    Result = (old_index ⟕-anti changed_ids) ∪ signature(new_state ⋉ changed_ids)

    - inserted ids: absent from old_index, recomputed from new_state;
    - updated ids: dropped by the anti-join, recomputed from new_state;
    - deleted ids: dropped by the anti-join, absent from new_state — gone;
    - untouched ids: pass through the anti-join, their text never read.

    This is the IVM shape (operators/ivm.py) applied to the dedup index:
    at 100 TB the signature table is maintained per epoch at a cost
    proportional to the CHANGED documents (both joins are on the id key,
    the changed set is epoch-sized and broadcast-eligible), while a full
    rebuild would re-hash the entire corpus every epoch. Pair generation
    downstream (lsh_bands → band join) consumes the maintained index
    exactly as it would a freshly built one.

    ``changed_ids`` may carry duplicates or extra columns (e.g. a raw CDF
    diff with one row per changed TURN of a conversation); only distinct
    ``id_col`` values are used. Ids whose new text folds to nothing must
    simply be absent from ``new_state`` (the caller's fold already drops
    them — see the empty-fold exclusion on the conversation relation).

    Identity with a full rebuild is pinned by
    tests/test_dedup_similarity.py::test_maintain_minhash_index_equals_rebuild
    for arbitrary diffs (property test), and the untouched-text-never-read
    claim by ..::test_maintain_index_does_not_rescan_untouched_corpus.
    """
    _check_mode(hash_mode)
    ids = changed_ids.select(F.col(id_col)).distinct()
    kept = old_index.join(ids, id_col, "left_anti")
    recomputed = minhash_signature(
        new_state.join(ids, id_col, "left_semi"),
        id_col, text_col, n_hashes, k, hash_mode,
    )
    return kept.unionByName(recomputed)


# ------------------------------------------------------------- winnowing


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
    hash_mode: str = "production",
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer et al., SIGMOD 2003 —
    the MOSS algorithm): from each document's word k-gram hash sequence,
    select the minimum hash of every sliding window of ``w`` consecutive
    grams, deduplicated by position. Guarantees: any shared run of
    w+k-1 words between two documents shares at least one selected
    fingerprint, while storing only ~2/(w+1) of all grams — the
    density/guarantee trade local-minima sampling cannot make.

    Ties inside a window break to the LEFTMOST position ((value, pos)
    lexicographic min — with 60-bit hashes ties are ~nonexistent; the
    rule just pins determinism for the oracle).

    Returns (id, pos, fp) — pos is the selected gram's word index.

    Plan: gram hashes are a narrow projection (one hash per gram), then
    posexplode + ONE doc-keyed sliding window computes every window's
    lexicographic-(value, pos) min as ``min(struct(h, pos))`` over
    ``ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING`` — struct ordering IS
    the winnowing rule, and the window min is O(grams) with native
    codegen. Rows whose window would hang past the last gram are
    filtered (``pos ≤ max(n_grams − w, 0)``), which also leaves short
    docs (< w grams) exactly their single whole-prefix window. One
    shuffle on the doc id (narrow 3-column rows) + the distinct.
    Measured at sf0.1 (5000 docs, local[32], min of 3): 1.02 s vs
    19.3 s for the original per-window nested-``aggregate`` fold — see
    the expression-placement comments in the body for where those 19 s
    actually went (inlined split re-evaluation and a pushed-down
    inferred filter re-running the hash transform), they were NOT
    inherent to the fold shape. Docs with fewer than k words produce no
    fingerprints.
    """
    _check_mode(hash_mode)
    if w < 1:
        raise ValueError(f"window w must be >= 1, got {w}")
    # Expression-placement rules this formulation obeys (each violation
    # was measured, all at sf0.1):
    # 1. the word array is a NAMED column before any lambda references it
    #    — an inlined split() re-runs the regex inside every element_at
    #    of a HOF (16.9 s vs 0.56 s for the signature projection alone);
    # 2. the EXPLODED expression is the cheap position sequence, not the
    #    hash array — InferFiltersFromGenerate infers size()>0/isnotnull
    #    on the generator child and pushes them below the project with
    #    the child expression substituted, so a hash-array generator
    #    re-evaluates the whole md5 transform (with splits re-inlined)
    #    twice per row in the pushed Filter (9.9 s for the explode stage
    #    vs 0.6 s this way);
    # 3. the gram hash is computed per exploded row from the carried _w
    #    ATTRIBUTE (one md5 per gram, split once per doc; Generate +
    #    Project fuse in whole-stage codegen so the duplicated word
    #    array never materializes).
    wd = df.select(
        F.col(id_col),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_w"),
    ).filter(F.size("_w") >= k)
    g = wd.select(
        F.col(id_col),
        F.col("_w"),
        F.posexplode(F.sequence(F.lit(0), F.size("_w") - k)).alias(
            "_pos", "_i"
        ),
    )
    gram = F.concat_ws(
        " ",
        *[
            F.element_at(F.col("_w"), (F.col("_i") + j + 1).cast("int"))
            for j in range(k)
        ],
    )
    rows = g.select(
        F.col(id_col), F.col("_pos"), hash64(gram, hash_mode).alias("_gh")
    )
    wspec = Window.partitionBy(id_col).orderBy("_pos").rowsBetween(0, w - 1)
    sel = F.min(F.struct(F.col("_gh"), F.col("_pos"))).over(wspec)
    last = F.max("_pos").over(Window.partitionBy(id_col))
    return (
        rows.select(
            F.col(id_col), F.col("_pos"), sel.alias("_s"), last.alias("_last")
        )
        .filter(F.col("_pos") <= F.greatest(F.col("_last") - (w - 1), F.lit(0)))
        .select(
            id_col,
            F.col("_s._pos").cast("int").alias("pos"),
            F.col("_s._gh").alias("fp"),
        )
        .distinct()
    )
