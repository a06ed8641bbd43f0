"""XPath/XML extraction — the true form of the reference's largest
extraction surface (util/XmlHelper.kt:54-127: namespace-aware XPath over
METS/MIX documents; jhove/JhoveParser.kt:29-156, 110-121: field extraction
from JHOVE output XML).

Spark's built-in ``xpath*`` functions (Hive UDFs under the hood) run
JVM-side with no Python in the path, but they match element names
literally and carry no namespace context — a path written ``/mets:mets/
mets:file`` against a default-namespaced document matches nothing. The
reference solves this with an explicit NamespaceContext
(XmlHelper.kt:60-78); the Spark-native equivalent is rewriting each path
step to a ``local-name()`` predicate, which matches regardless of prefix
or default namespace. :func:`local_name_path` does that rewrite, and the
``ns_agnostic=True`` default on every wrapper applies it.

All wrappers are thin Column builders (composable inside any plan); XML
*construction* for round-trip tests lives in the catalog query so the
DuckDB oracle can build the identical document string.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


_STEP = re.compile(r"^(?P<axis>@?)(?:(?P<ns>[\w.-]+):)?(?P<name>[\w.-]+)$")


def local_name_path(path: str) -> str:
    """Rewrite an XPath so element steps match by local name only.

    ``/mets:mets/mets:fileSec/file/@ID`` →
    ``/*[local-name()='mets']/*[local-name()='fileSec']/*[local-name()='file']/@ID``

    Attribute steps and non-name steps (``*``, functions, predicates,
    ``..``, ``.``) pass through untouched; namespace prefixes on
    attributes are dropped the same way (attributes in a default
    namespace are unprefixed in practice — XmlHelper.kt resolves them via
    the same context).
    """
    out: list[str] = []
    for step in path.split("/"):
        if step == "":
            out.append(step)
            continue
        m = _STEP.match(step)
        if not m or m.group("axis") == "@":
            # attribute: strip a namespace prefix if present, else verbatim
            if m and m.group("axis") == "@" and m.group("ns"):
                out.append(f"@{m.group('name')}")
            else:
                out.append(step)
            continue
        out.append(f"*[local-name()='{m.group('name')}']")
    return "/".join(out)


def _prep(path: str, ns_agnostic: bool) -> str:
    return local_name_path(path) if ns_agnostic else path


def xpath_values(xml: Column | str, path: str, ns_agnostic: bool = True) -> Column:
    """All matching node string-values, as ``array<string>``
    (XmlHelper.kt:103-118 getNodeList analogue)."""
    return F.xpath(xml, F.lit(_prep(path, ns_agnostic)))


def xpath_first(xml: Column | str, path: str, ns_agnostic: bool = True) -> Column:
    """First matching node's string-value ('' when absent — wrap in
    ``nullif`` for SQL-null semantics; XmlHelper.kt:84-96 getNode)."""
    return F.xpath_string(xml, F.lit(_prep(path, ns_agnostic)))


def xpath_first_null(xml: Column | str, path: str, ns_agnostic: bool = True) -> Column:
    """Like :func:`xpath_first` but yields NULL for a missing node, the
    reference's Optional-empty (XmlHelper.kt:92-95)."""
    return F.nullif(xpath_first(xml, path, ns_agnostic), F.lit(""))


def xpath_long(xml: Column | str, path: str, ns_agnostic: bool = True) -> Column:
    """First match as a long (JhoveParser.kt numeric MIX fields)."""
    return F.xpath_long(xml, F.lit(_prep(path, ns_agnostic)))


def xpath_exists(xml: Column | str, path: str, ns_agnostic: bool = True) -> Column:
    """True iff the path matches at least one node (XmlHelper.kt:121-126)."""
    return F.xpath_boolean(xml, F.lit(_prep(path, ns_agnostic)))


def xpath_count(xml: Column | str, path: str, ns_agnostic: bool = True) -> Column:
    """Number of matching nodes."""
    return F.xpath_long(xml, F.lit(f"count({_prep(path, ns_agnostic)})"))


def xml_escape(col: Column) -> Column:
    """Minimal XML text escaping (&, <, >) — enough for element content;
    the reference serializes through a DOM so escaping is implicit
    (XmlHelper.kt writes via Transformer). Order matters: & first."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def xml_escape_attr(col: Column) -> Column:
    """Attribute-value escaping: element escaping plus the double quote
    (values are emitted inside double-quoted attributes)."""
    return F.replace(xml_escape(col), F.lit('"'), F.lit("&quot;"))
