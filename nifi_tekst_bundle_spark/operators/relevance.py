"""Keyword-relevance search over the document corpus.

The embedding path (operators/similarity.py) answers "find documents near
this vector"; this module answers the lexical twin — "find the documents
most relevant to these query terms" — the retrieval primitive of a
training-data pipeline's targeted-corpus construction (seed-query
expansion, benchmark-adjacent document mining next to the contamination
scan in plans/catalog.py).

Scoring is BM25-shaped: per-term
``idf(t) * tf * (k1+1) / (tf + k1*(1-b+b*len/avglen))`` summed over the
query terms — with ONE deliberate deviation: ``idf`` is the rational
Robertson–Sparck-Jones core ``(N - df + 0.5) / (df + 0.5)`` WITHOUT the
usual log wrap. Spark's JVM libm and the SQL oracle's libm disagree in
the last ulp on transcendentals, so the log would break bit-for-bit
cross-engine verification (the repo-wide no-transcendentals rule,
plans/catalog.py module docstring); +, -, *, / are correctly-rounded
IEEE in both engines, so this variant verifies exactly. A production
deployment wanting literal BM25 swaps one expression — plan shape is
unchanged (the log is a narrow projection op).

Plan shape (100 TB): one narrow projection computes per-doc length and
per-term tf (term count is a query property — a handful — so tf columns
are fixed-width, no posting-list explode); ONE map-side-combinable
global aggregate reduces (N, total_len, df_t...) to a single row that
broadcasts back onto the scan; top-k is TakeOrderedAndProject — no
global sort, no shuffle of the corpus. Everything stays whole-stage
codegen; the only data movement is the 1-row stats broadcast and the
k-row result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# dyadic-rational BM25 constants: exactly representable doubles, so both
# engines see literally identical values (1.2/0.75 — the textbook pair —
# would make k1+1 a round-to-nearest TIE at double precision, resolved
# half-even vs half-up differently across parsers)
K1 = 1.5
B = 0.75


IDF_MODES = ("oracle", "production")


def keyword_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 25,
    idf_mode: str = "oracle",
) -> DataFrame:
    """Top-k documents by summed BM25-shaped term relevance.

    Returns (id_col, score) for the ``k`` highest-scoring documents that
    match at least one term; ties break on ascending id so the result set
    is deterministic. Terms are matched as whole lowercase whitespace
    tokens (the corpus-side normalization is lower+trim+split — the same
    token space as the dedup shinglers).

    ``idf_mode`` mirrors the dedup hash-backend convention: ``oracle``
    uses the rational RSJ idf (cross-engine bit parity, module
    docstring); ``production`` uses the Lucene/BM25 form
    ``ln(1 + rational)`` — NOT the bare ``ln(rational)``, which goes
    negative for terms in more than half the corpus and inverts their
    ranking (the classic negative-idf defect). ``ln(1+x)`` is positive
    and monotone, so single-term rankings are identical in both modes
    (pinned in tests); multi-term sums can reorder near-ties. Plan shape
    is identical — one extra narrow op in the projection.
    """
    if not terms:
        raise ValueError("keyword_topk needs at least one query term")
    if idf_mode not in IDF_MODES:
        raise ValueError(
            f"idf_mode must be one of {IDF_MODES}, got {idf_mode!r}"
        )
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")

    def _tf(term: str):
        lit = F.lit(term.lower())
        return F.size(F.filter(words, lambda w: w == lit))

    tf_cols = [_tf(t).alias(f"_tf_{i}") for i, t in enumerate(terms)]
    proj = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.size(words).alias("_dl"), *tf_cols
    )
    stats = proj.agg(
        F.count("*").alias("_n"),
        F.sum("_dl").alias("_tl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    s = proj.crossJoin(F.broadcast(stats))
    # evaluation order is pinned (and mirrored token-for-token in the SQL
    # oracle): avglen = tl/n; norm = K1*((1-B) + (B*dl)/avglen);
    # term = ((idf*tf)*(K1+1))/(tf+norm); score = left-fold sum of terms
    avglen = F.col("_tl") / F.col("_n")
    norm = F.lit(K1) * (
        F.lit(1.0 - B) + (F.lit(B) * F.col("_dl")) / avglen
    )
    score = None
    any_tf = None
    for i in range(len(terms)):
        tf = F.col(f"_tf_{i}")
        idf = (F.col("_n") - F.col(f"_df_{i}") + F.lit(0.5)) / (
            F.col(f"_df_{i}") + F.lit(0.5)
        )
        if idf_mode == "production":
            idf = F.log(F.lit(1.0) + idf)
        term = ((idf * tf) * F.lit(K1 + 1.0)) / (tf + norm)
        score = term if score is None else score + term
        any_tf = tf if any_tf is None else any_tf + tf
    return (
        s.filter(any_tf > 0)
        .select(F.col(id_col), F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def keyword_topk_sql(
    source: str, id_col: str, text_col: str, terms: list[str], k: int = 25
) -> str:
    """The DuckDB oracle for :func:`keyword_topk` — generated from the
    SAME constants and the same pinned evaluation order, so scores match
    bit-for-bit before the shared round(…, 6)."""
    tf_sel = ",\n    ".join(
        f"len(list_filter(w, x -> x = '{t.lower()}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_sel = ",\n    ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    one_minus_b = 1.0 - B
    k1_plus_1 = K1 + 1.0
    term_exprs = [
        f"((((n - df_{i} + 0.5) / (df_{i} + 0.5)) * tf_{i}) * {k1_plus_1!r})"
        f" / (tf_{i} + ({K1!r} * ({one_minus_b!r} + ({B!r} * dl) / (tl / n))))"
        for i in range(len(terms))
    ]
    score = " + ".join(term_exprs)
    any_tf = " + ".join(f"tf_{i}" for i in range(len(terms)))
    return f"""
WITH d AS (
  SELECT {id_col}, string_split_regex(lower(trim({text_col})), '\\s+') AS w
  FROM {source} WHERE {text_col} IS NOT NULL
),
p AS (
  SELECT {id_col}, len(w) AS dl,
    {tf_sel}
  FROM d
),
s AS (
  SELECT count(*) AS n, sum(dl) AS tl,
    {df_sel}
  FROM p
)
SELECT {id_col}, round({score}, 6) AS score
FROM p, s
WHERE {any_tf} > 0
ORDER BY score DESC, {id_col}
LIMIT {k}
"""
