"""HTML → text extraction, fully JVM-side.

The web-scrape-to-training-text step: drop script/style subtrees, strip
tags, decode the common entities, normalize whitespace. Every stage is a
Spark ``regexp_replace``/``regexp_extract`` built-in — no Python in the
hot path, the whole chain stays inside one whole-stage-codegen projection
(zero shuffle, scales linearly with input bytes).

Patterns are written in the dialect intersection of Java regex (Spark)
and RE2 (DuckDB oracle): inline ``(?is)`` flags, non-greedy ``.*?``,
character classes — no backreferences, no lookarounds. The same
Java-vs-RE2 agreement discipline as the PII scrubber
(plans/catalog.py q_docs_pii_scrub).

Reference analogue: the bundle's per-document text transforms run inside
NiFi processors one flowfile at a time (Jhove.kt:55-112 enrich-and-route);
here the same per-document cleanup is a vectorized column expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# subtree-dropping tags: their CONTENT is noise, not text. Dropped with
# one RE2-compatible regex per tag (a single combined pattern would need a
# \1 backreference in the closing tag, which RE2 lacks — the oracle-parity
# dialect is Java∩RE2).
_BLOCK_TAGS = ("script", "style", "noscript")

# tags whose END marks a line break in the extracted text
_BREAK_TAGS = r"(?i)</(p|div|li|h[1-6]|tr|title)>|<br\s*/?>"

_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST: so '&amp;lt;' decodes to '&lt;' not '<'
)


def drop_block(col: Column, tag: str) -> Column:
    """Remove one subtree-dropping tag's elements, content included.

    Per-tag literal closing tags keep the pattern inside the Java∩RE2
    dialect (a ``</\\1>`` backreference would be Java-only)."""
    return F.regexp_replace(col, rf"(?is)<{tag}\b[^>]*>.*?</{tag}>", "")


def html_to_text(col: Column) -> Column:
    """Extract readable text from an HTML column.

    Stages: drop script/style/noscript subtrees → break-tags to
    newline → strip remaining tags → decode common entities →
    collapse horizontal whitespace → trim. Deterministic, zero-shuffle,
    codegen-friendly."""
    out = col
    for tag in _BLOCK_TAGS:
        out = drop_block(out, tag)
    out = F.regexp_replace(out, _BREAK_TAGS, "\n")
    out = F.regexp_replace(out, r"(?s)<[^>]*>", "")
    for ent, rep in _ENTITIES:
        out = F.regexp_replace(out, ent, rep)
    out = F.regexp_replace(out, r"[ \t\r]+", " ")
    out = F.regexp_replace(out, r" ?\n ?", "\n")
    out = F.regexp_replace(out, r"\n+", "\n")
    # trim strips spaces only; anchor-strip the edge newlines too
    return F.regexp_replace(F.trim(out), r"^\n+|\n+$", "")


def html_title(col: Column) -> Column:
    """First <title> element's decoded text ('' when absent)."""
    raw = F.regexp_extract(col, r"(?is)<title[^>]*>(.*?)</title>", 1)
    out = raw
    for ent, rep in _ENTITIES:
        out = F.regexp_replace(out, ent, rep)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


# The same pipeline as ANSI SQL for the DuckDB oracle (RE2 dialect).
# regexp_replace(..., 'g') applies globally; stage order matches
# html_to_text exactly.
def html_to_text_sql(expr: str) -> str:
    out = expr
    for tag in _BLOCK_TAGS:
        out = (
            f"regexp_replace({out}, '(?is)<{tag}\\b[^>]*>.*?</{tag}>', '', 'g')"
        )
    out = f"regexp_replace({out}, '(?i)</(p|div|li|h[1-6]|tr|title)>|<br\\s*/?>', chr(10), 'g')"
    out = f"regexp_replace({out}, '(?s)<[^>]*>', '', 'g')"
    for ent, rep in _ENTITIES:
        lit = rep.replace("'", "''")
        out = f"replace({out}, '{ent}', '{lit}')"
    out = f"regexp_replace({out}, '[ \\t\\r]+', ' ', 'g')"
    out = f"regexp_replace({out}, ' ?\\n ?', chr(10), 'g')"
    out = f"regexp_replace({out}, '\\n+', chr(10), 'g')"
    return f"regexp_replace(trim({out}), '^\\n+|\\n+$', '', 'g')"


def html_title_sql(expr: str) -> str:
    out = f"regexp_extract({expr}, '(?is)<title[^>]*>(.*?)</title>', 1)"
    for ent, rep in _ENTITIES:
        lit = rep.replace("'", "''")
        out = f"replace({out}, '{ent}', '{lit}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"
