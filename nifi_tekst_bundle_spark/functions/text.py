"""Per-document text enrichment — the engine's Jhove-processor analogue
(reference Jhove.kt:449-555: per-file validate/extract/aggregate → route).

The reference validates image formats per file with an external library;
the engine enriches per-turn *text* with the same shape: a vectorized stage
computing normalization + quality/validation columns over Arrow batches
(never per-row Python), whose outputs drive routing (valid → main table,
invalid → dead letter) and aggregation (A2 validation aggregate,
Jhove.kt:490-516).

Where a pyspark.sql builtin expresses the transform we use it (JVM-side,
whole-stage codegen); Unicode NFC normalization needs Python's unicodedata,
so it runs as a pandas UDF over Arrow batches (input_hint: "vectorized
pandas/Arrow UDFs (no per-row Python) throughout").
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------- NFC


# Unicode category Cc is exactly U+0000–U+001F and U+007F–U+009F; keep
# \t (09) and \n (0A). A compiled character-class regex lets pandas strip
# control chars in one vectorized .str.replace instead of a per-character
# Python loop (the r3 formulation iterated every char of every string in
# the interpreter — Arrow-batched at the interface but interpreter-bound
# inside; ~5× slower on the docs fixture).
_CC_CLASS = re.compile("[\x00-\x08\x0b-\x1f\x7f-\x9f]")


@F.pandas_udf(T.StringType())
def nfc_normalize(s: pd.Series) -> pd.Series:
    """Unicode NFC normalization + control-char strip (keeps \\t \\n).

    Fully vectorized pandas: .str.normalize('NFC') then one regex replace
    over the Cc class — no per-row (let alone per-char) Python. NaN/None
    propagate through .str methods and arrive in Spark as NULL."""
    return s.str.normalize("NFC").str.replace(_CC_CLASS, "", regex=True)


# ------------------------------------------------------- token counting

# BPE-ish word/number/punct splitter (public tokenizer-pretoken pattern)
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(col: Column) -> Column:
    """Regex token count, JVM-side."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), 0))


def whitespace_token_count(col: Column) -> Column:
    return F.size(F.split(F.trim(col), r"\s+"))


# ------------------------------------------------------- quality scoring

STOPWORDS_EN = (
    "the a of and to in is it that for on as with at by an be this are or".split()
)


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS_EN
    words = F.split(F.lower(F.trim(col)), r"\s+")
    hits = F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in sw])))
    # distinct-stopword coverage ratio (array_intersect dedups — documented)
    return hits / F.greatest(F.size(words), F.lit(1))


def punct_ratio(col: Column) -> Column:
    punct = F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return punct / F.greatest(F.length(col), F.lit(1))


def quality_score(col: Column) -> Column:
    """Deterministic 0..1 heuristic quality score: length band + low punct
    + some stopword coverage. The per-document validation verdict of the
    reference (isValid, Jhove.kt:140-145) as a continuous score."""
    length = F.length(col)
    len_ok = F.when((length >= 20) & (length <= 5000), F.lit(0.4)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) < 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
    sw_ok = F.when(stopword_ratio(col) > 0.02, F.lit(0.3)).otherwise(F.lit(0.0))
    return F.round(len_ok + punct_ok + sw_ok, 2)


# ------------------------------------------------------- language id

LANG_MARKERS: dict[str, list[str]] = {
    "en": "the and of to is in that it for with".split(),
    "de": "der die das und ist nicht ein zu mit von".split(),
    "es": "el la de que los las una por con para".split(),
    "fr": "le la les des une est pour dans que sur".split(),
    "nob": "og det er en som på til av ikke jeg".split(),
}


def lang_id(col: Column) -> Column:
    """N-gram/marker-word language heuristic with deterministic tiebreak
    (alphabetical language code order; 'und' when nothing matches)."""
    words = F.split(F.lower(F.trim(col)), r"\s+")
    scored = []
    for code in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[code]])
        score = F.size(F.array_intersect(words, markers))
        scored.append(F.struct(score.alias("s"), F.lit(code).alias("c")))
    # max by (score, then reversed-code) — deterministic; ties pick the
    # alphabetically first code via the struct trick on negated order
    best = F.greatest(*scored) if len(scored) > 1 else scored[0]
    return F.when(best.getField("s") > 0, best.getField("c")).otherwise(F.lit("und"))


# ------------------------------------------------------- fingerprinting

FP_MOD = 2147483647  # 2^31-1; keeps acc*31+c < 2^36 in int64 on both engines


def fingerprint(col: Column) -> Column:
    """Deterministic rolling polynomial hash of the text's characters —
    the document-fingerprint analogue of the reference's MD5 content
    checksum (CreateMetsBrowsing.kt:314-324) in streamable form."""
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(31) + F.ascii(ch)) % F.lit(FP_MOD),
    )


def md5_checksum(col: Column) -> Column:
    """P4: hex MD5 (CreateMetsBrowsing.kt:314-324)."""
    return F.md5(col.cast("binary"))


# ------------------------------------------------------- enrichment stage


def enrich(df, text_col: str = "text"):
    """The full enrichment stage: one pass adding normalization +
    validation + stats columns, then a route column (the 4-way
    success/well-formed/empty/failure routing of Jhove.kt:520-537)."""
    c = F.col(text_col)
    out = (
        df.withColumn("text_norm", nfc_normalize(c))
        .withColumn("n_tokens", token_count(c))
        .withColumn("quality", quality_score(c))
        .withColumn("lang_pred", lang_id(c))
        .withColumn("fp", fingerprint(c))
    )
    return out.withColumn(
        "route",
        F.when(c.isNull() | (F.length(F.trim(c)) == 0), F.lit("empty"))
        .when(F.col("quality") >= 0.7, F.lit("success"))
        .when(F.col("quality") >= 0.4, F.lit("well-formed"))
        .otherwise(F.lit("failure")),
    )
