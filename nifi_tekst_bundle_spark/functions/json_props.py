"""Nested struct construction + recursive merge — the GenerateJsonFromProps
processor (reference GenerateJsonFromProps.kt) re-expressed on static Spark
schemas.

P1/P2: dotted property names (``foo.bar`` → {"foo":{"bar":v}}) with
``name[i]`` array indexing (GenerateJsonFromProps.kt:215-295) become an
up-front nested StructType build — Spark schemas are static, so the dynamic
JSON-tree walk disappears at plan time.

P3: the recursive merge rule (objects recurse, everything else new-wins,
arrays overwritten whole — GenerateJsonFromProps.kt:302-322) becomes a
schema-driven coalesce overlay. That exact rule is also the engine's
column-level upsert rule for partial UPDATE events (operators.resolve).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _insert(tree: dict, path: list[str], value: Column) -> None:
    head, rest = path[0], path[1:]
    if not rest:
        tree[head] = value
        return
    node = tree.setdefault(head, {})
    if not isinstance(node, dict):
        raise ValueError(f"path conflict at {head!r}")
    _insert(node, rest, value)


def _tree_to_struct(tree) -> Column:
    if not isinstance(tree, dict):
        return tree
    fields = []
    arrays: dict[str, dict[int, Column]] = {}
    for key in tree:
        if "[" in key:  # name[i] array syntax
            name, idx = key[:-1].split("[")
            arrays.setdefault(name, {})[int(idx)] = _tree_to_struct(tree[key])
        else:
            fields.append(_tree_to_struct(tree[key]).alias(key))
    for name, items in arrays.items():
        size = max(items) + 1
        # missing indices padded with nulls (putNested array padding,
        # GenerateJsonFromProps.kt:262-275)
        elems = [
            items.get(i, F.lit(None)) for i in range(size)
        ]
        fields.append(F.array(*elems).alias(name))
    return F.struct(*fields)


def build_nested(props: dict[str, Column]) -> Column:
    """{"foo.bar": col, "items[0].name": col} → one nested struct column."""
    tree: dict = {}
    for dotted, col in props.items():
        _insert(tree, dotted.split("."), col)
    return _tree_to_struct(tree)


def build_nested_json(props: dict[str, Column], pretty: bool = False) -> Column:
    st = build_nested(props)
    if pretty:
        return F.to_json(st, {"pretty": "true"})
    return F.to_json(st)


def merge_structs(old: Column, new: Column, schema: T.StructType) -> Column:
    """Recursive new-wins merge of two same-schema structs: objects recurse,
    scalars/arrays are overwritten when the new side is non-null."""
    fields = []
    for f in schema.fields:
        o, n = old.getField(f.name), new.getField(f.name)
        if isinstance(f.dataType, T.StructType):
            merged = F.when(n.isNull(), o).when(o.isNull(), n).otherwise(
                merge_structs(o, n, f.dataType)
            )
        else:
            merged = F.coalesce(n, o)
        fields.append(merged.alias(f.name))
    return F.struct(*fields)


def merge_json_columns(df: DataFrame, old_col: str, new_col: str,
                       schema: T.StructType, out_col: str) -> DataFrame:
    """Merge two JSON string columns under a shared schema (the
    OUTPUT_MODE=merge path, GenerateJsonFromProps.kt:179-195)."""
    o = F.from_json(F.col(old_col), schema)
    n = F.from_json(F.col(new_col), schema)
    return df.withColumn(out_col, F.to_json(merge_structs(o, n, schema)))
