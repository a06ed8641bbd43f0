"""Skew salting + cascade cleanup operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from nifi_tekst_bundle_spark.operators import cleanup, skew


def _skewed_events(spark, hot_n=2000, cold_n=50):
    hot = spark.range(hot_n).select(
        F.lit("conv-hot").alias("conv_id"),
        (F.col("id") % 5).cast("int").alias("turn_idx"),
        F.col("id").alias("lsn"),
        (F.col("id") * 2).cast("double").alias("v"),
    )
    cold = spark.range(cold_n).select(
        F.concat(F.lit("conv-"), F.col("id").cast("string")).alias("conv_id"),
        F.lit(1).cast("int").alias("turn_idx"),
        (F.col("id") + 100000).alias("lsn"),
        F.lit(1.0).alias("v"),
    )
    return hot.union(cold)


def test_detect_hot_keys(spark):
    ev = _skewed_events(spark)
    hot = skew.detect_hot_keys(ev, ["conv_id"], threshold=100).collect()
    assert [r["conv_id"] for r in hot] == ["conv-hot"]


def test_salted_repartition_spreads_hot_key(spark):
    ev = _skewed_events(spark)
    salted = skew.salted_repartition(ev, ["conv_id"], n_partitions=8, n_salts=8)
    dist = (
        salted.filter(F.col("conv_id") == "conv-hot")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    # the hot key lands on several partitions, not one
    assert len(dist) >= 4
    assert max(r["count"] for r in dist) < 2000


def test_salted_agg_matches_plain_agg(spark):
    ev = _skewed_events(spark)
    plain = {
        (r["conv_id"], r["turn_idx"]): (r["mx"], r["cnt"])
        for r in ev.groupBy("conv_id", "turn_idx")
        .agg(F.max("lsn").alias("mx"), F.count("*").alias("cnt"))
        .collect()
    }
    salted = {
        (r["conv_id"], r["turn_idx"]): (r["mx"], r["cnt"])
        for r in skew.salted_agg(
            ev.withColumn("mx", F.col("lsn")).withColumn("cnt", F.lit(1)),
            ["conv_id", "turn_idx"],
            {"mx": (F.max, F.max), "cnt": (F.sum, F.sum)},
        ).collect()
    }
    assert plain == salted


def test_cascade_cleanup(spark):
    pre = spark.createDataFrame([("c1",), ("c2",), ("c3",)], ["conv_id"])
    post = spark.createDataFrame(
        [("c1", 1), ("c3", 2)], ["conv_id", "turn_idx"]
    )  # c2 emptied
    derived = spark.createDataFrame(
        [("c1", "enr-a"), ("c2", "enr-b"), ("c3", "enr-c"), ("c2", "enr-d")],
        ["conv_id", "payload"],
    )
    emptied = cleanup.emptied_conversations(pre, post).collect()
    assert [r["conv_id"] for r in emptied] == ["c2"]
    kept = cleanup.cleanup_emptied(derived, pre, post).collect()
    assert sorted(r["payload"] for r in kept) == ["enr-a", "enr-c"]
    # cascade invalidation removes changed conversations' derived rows
    changed = spark.createDataFrame([("c1",)], ["conv_id"])
    inv = cleanup.cascade_invalidate(derived, changed).collect()
    assert sorted(r["payload"] for r in inv) == ["enr-b", "enr-c", "enr-d"]
