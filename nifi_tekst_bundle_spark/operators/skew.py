"""Hot-key skew handling — salted repartition + two-phase aggregation.

The reference processes one item per thread serially, so a 10k-page item
just takes long (SURVEY.md §4: skew handling is absent there). At
10^10-event scale a hot conversation concentrates an epoch's work on one
shuffle partition; these helpers defuse it:

- ``detect_hot_keys``: per-batch heavy-hitter detection (cheap count agg)
- ``salted_repartition``: spread a hot key over SALT sub-partitions
- ``salted_agg``: two-phase aggregate (partial on (key, salt), final on
  key) for aggregations whose combine is associative — LWW registers are
  (max/argmax), so the engine's batch_registers can run salted when an
  epoch is skewed.

AQE's skew-join splitting handles the join side; salting handles the
aggregation side, which AQE does not split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def detect_hot_keys(
    df: DataFrame, key_cols: list[str], threshold: int
) -> DataFrame:
    """Keys whose per-batch event count exceeds threshold."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > threshold)
    )


def with_salt(df: DataFrame, n_salts: int, salt_on: str = "lsn") -> DataFrame:
    """Deterministic salt derived from an existing column (never random —
    replays must be bit-for-bit)."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts)).cast("int")
    )


def salted_repartition(
    df: DataFrame, key_cols: list[str], n_partitions: int, n_salts: int = 8,
    salt_on: str = "lsn",
) -> DataFrame:
    return with_salt(df, n_salts, salt_on).repartition(
        n_partitions, *key_cols, SALT_COL
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple],
    n_salts: int = 8,
    salt_on: str = "lsn",
) -> DataFrame:
    """Two-phase aggregation for associative aggregates.

    aggs: out_name -> (partial_fn, final_fn) where each fn is a
    Column→Column aggregate builder, e.g. {"mx": (F.max, F.max)} over
    input column named out_name.
    """
    partial = (
        with_salt(df, n_salts, salt_on)
        .groupBy(*key_cols, SALT_COL)
        .agg(*[pf(name).alias(name) for name, (pf, _) in aggs.items()])
    )
    return partial.groupBy(*key_cols).agg(
        *[ff(name).alias(name) for name, (_, ff) in aggs.items()]
    )
