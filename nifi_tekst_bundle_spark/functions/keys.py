"""Key/scalar functions — the reference's filename/key manipulation surface
re-expressed as JVM-side column expressions.

Each function cites its reference counterpart so parity can be checked.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# O10: regex key extraction, RenameUtils.kt:11-14
FILENAME_KEY_REGEX = r"^(.+)_\d+\.(jp2|tif|tiff)$"


def extract_id_from_filename(col: Column) -> Column:
    return F.regexp_extract(col, FILENAME_KEY_REGEX, 1)


def extract_page_no(col: Column) -> Column:
    """The zero-padded page-number suffix as an int (null when absent;
    ANSI-safe)."""
    ex = F.regexp_extract(col, r"_(\d+)\.(jp2|tif|tiff)$", 1)
    return F.when(ex == "", F.lit(None)).otherwise(ex).cast("int")


# P5: zero-pad page labels, ReorderFiles.kt:136 (String.format("%05d", n))
def zero_pad(col: Column, width: int = 5) -> Column:
    return F.format_string(f"%0{width}d", col)


# O6: store-specific key normalization, RenameS3Utils.kt:146-150
def normalize_extension(col: Column) -> Column:
    return F.regexp_replace(col, r"\.(jp2|tiff)$", ".tif")


# P7: prefix add/strip + trailing-slash handling
# (ReorderFiles.kt:135, DeleteAllS3ObjectsByPrefix.kt:96,110-113)
def with_item_prefix(col: Column, prefix: str = "tekst_") -> Column:
    return F.concat(F.lit(prefix), col)


def strip_item_prefix(col: Column, prefix: str = "tekst_") -> Column:
    return F.regexp_replace(col, f"^{prefix}", "")


def ensure_trailing_slash(col: Column) -> Column:
    """The trailing-slash guard against sibling-prefix over-match
    (DeleteAllS3ObjectsByPrefix.kt:115-117)."""
    return F.when(col.endswith("/"), col).otherwise(F.concat(col, F.lit("/")))


# P8: URN/URL construction, CreateMetsBrowsing.kt:268-275
def urn(col: Column, authority: str = "URN:NBN:no-nb_") -> Column:
    return F.concat(F.lit(authority), col)


def file_url(col: Column, scheme: str = "file://ocr/") -> Column:
    return F.concat(F.lit(scheme), col)


# P6: filename parsing (suffix / base / extension)
def extension(col: Column) -> Column:
    return F.substring_index(col, ".", -1)


def base_name(col: Column) -> Column:
    """Name without the final extension (nameWithoutExtension)."""
    return F.regexp_replace(col, r"\.[^.]*$", "")


# P10: rational → decimal division, scale 10 HALF_UP (JhoveParser.kt:55-67).
# Operand precisions are sized so Spark's decimal-division result keeps
# scale ≥ 10 (wider operands trigger Catalyst's scale reduction to 6).
def rational_decimal(num: Column, den: Column) -> Column:
    return F.round(
        num.cast("decimal(27,10)") / den.cast("decimal(10,0)"), 10
    ).cast("decimal(38,10)")
