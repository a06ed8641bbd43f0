"""Scalar/enrichment function tests (the reference's processor unit tests,
GenerateJsonFromPropsTest.kt / JhoveTest.kt pattern)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nifi_tekst_bundle_spark.functions import json_props, keys, text


def test_key_functions(spark):
    df = spark.createDataFrame(
        [("tekst_ee11f8dd_00002.jp2",), ("item_9_00010.tif",), ("noext",)],
        ["name"],
    )
    out = df.select(
        keys.extract_id_from_filename(F.col("name")).alias("id"),
        keys.extract_page_no(F.col("name")).alias("page"),
        keys.normalize_extension(F.col("name")).alias("norm"),
    ).collect()
    assert out[0]["id"] == "tekst_ee11f8dd"
    assert out[0]["page"] == 2
    assert out[0]["norm"] == "tekst_ee11f8dd_00002.tif"
    assert out[1]["id"] == "item_9"
    assert out[2]["id"] == ""


def test_zero_pad_and_urn(spark):
    df = spark.createDataFrame([(3,)], ["n"])
    row = df.select(
        keys.zero_pad(F.col("n")).alias("p"),
        keys.urn(keys.zero_pad(F.col("n"))).alias("u"),
    ).first()
    assert row["p"] == "00003"
    assert row["u"] == "URN:NBN:no-nb_00003"


def test_nfc_normalize_and_tokens(spark):
    # 'café' with decomposed e + combining acute, plus a control char
    decomposed = "café\x07 x"
    df = spark.createDataFrame([(decomposed,), (None,)], ["text"])
    out = df.select(
        text.nfc_normalize(F.col("text")).alias("norm"),
        text.token_count(F.col("text")).alias("nt"),
    ).collect()
    assert out[0]["norm"] == "café x"
    # BPE-ish pretokenizer: "caf" + "é" (non-ASCII) + BEL + "x"
    assert out[0]["nt"] == 4
    assert out[1]["norm"] is None


def test_quality_and_route(spark):
    good = "the quick brown fox jumps over the lazy dog and runs far away today"
    df = spark.createDataFrame([(good,), ("",), ("!!! ???",)], ["text"])
    out = text.enrich(df).select("route", "quality", "lang_pred").collect()
    assert out[0]["route"] == "success"
    assert out[0]["lang_pred"] == "en"
    assert out[1]["route"] == "empty"
    assert out[2]["route"] == "failure"


def test_fingerprint_deterministic(spark):
    df = spark.createDataFrame([("abc",), ("abc",), ("abd",)], ["text"])
    fps = [r[0] for r in df.select(text.fingerprint(F.col("text"))).collect()]
    assert fps[0] == fps[1] != fps[2]
    # matches the straightforward python rolling hash
    expect = 0
    for ch in "abc":
        expect = (expect * 31 + ord(ch)) % text.FP_MOD
    assert fps[0] == expect


def test_build_nested_json(spark):
    df = spark.createDataFrame([("v1", "v2", "v3")], ["a", "b", "c"])
    out = df.select(
        json_props.build_nested_json(
            {
                "foo.bar": F.col("a"),
                "foo.baz": F.col("b"),
                "items[1].name": F.col("c"),
            }
        ).alias("j")
    ).first()["j"]
    assert '"foo":{"bar":"v1","baz":"v2"}' in out
    # array padded with null at index 0 (putNested padding semantics)
    assert '"items":[null,{"name":"v3"}]' in out.replace(" ", "")


def test_merge_structs_new_wins(spark):
    schema = T.StructType(
        [
            T.StructField("x", T.StringType()),
            T.StructField(
                "nested",
                T.StructType(
                    [T.StructField("a", T.StringType()), T.StructField("b", T.StringType())]
                ),
            ),
        ]
    )
    df = spark.createDataFrame(
        [('{"x":"old","nested":{"a":"oa","b":"ob"}}', '{"nested":{"b":"nb"}}')],
        ["old", "new"],
    )
    out = json_props.merge_json_columns(df, "old", "new", schema, "merged").first()[
        "merged"
    ]
    # objects recurse (a kept, b overwritten), scalars new-wins (x kept: new null)
    assert '"x":"old"' in out
    assert '"a":"oa"' in out
    assert '"b":"nb"' in out


def test_rational_decimal(spark):
    df = spark.createDataFrame([(1, 3)], ["n", "d"])
    v = df.select(keys.rational_decimal(F.col("n"), F.col("d")).alias("r")).first()["r"]
    assert str(v) == "0.3333333333"
