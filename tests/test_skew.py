"""Skew operator tests: exact semantics under a planted hot key, the
salt-spread property, and outer-join guard rails."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from replibyte_spark.operators.skew import (
    _salt_col,
    salted_count_distinct,
    salted_join,
)


def _hot_key_frames(spark):
    # 10_000 rows for key 1 (hot), 10 rows each for keys 2..21
    left = spark.range(10_200).select(
        F.when(F.col("id") < 10_000, F.lit(1))
        .otherwise((F.col("id") - 10_000) / 10 + 2).cast("long").alias("k"),
        F.col("id").alias("payload"))
    right = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(1, 22)], "k long, label string")
    return left, right


def test_salted_join_equals_plain_join(spark):
    left, right = _hot_key_frames(spark)
    plain = left.join(right, "k").groupBy("k").count()
    salted = salted_join(left, right, "k", factor=8).groupBy("k").count()
    assert sorted(map(tuple, salted.collect())) == \
        sorted(map(tuple, plain.collect()))
    # the salt column must not escape
    assert salted_join(left, right, "k").columns == \
        left.join(right, "k").columns


def test_salted_join_left_rows_preserved(spark):
    left, right = _hot_key_frames(spark)
    some_right = right.filter(F.col("k") <= 5)
    out = salted_join(left, some_right, "k", factor=4, how="left")
    assert out.count() == left.count()
    anti = salted_join(left, some_right, "k", factor=4, how="left_anti")
    assert anti.count() == left.filter(F.col("k") > 5).count()


def test_salted_join_rejects_right_outer(spark):
    left, right = _hot_key_frames(spark)
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="right")


def test_salt_actually_spreads_hot_key(spark):
    left, _ = _hot_key_frames(spark)
    hot = left.filter(F.col("k") == 1).withColumn(
        "__salt", _salt_col(["k", "payload"], 8))
    n_buckets = hot.select("__salt").distinct().count()
    assert n_buckets == 8  # 10k rows of one key land in every bucket


def test_salted_count_distinct_exact(spark):
    df = spark.range(50_000).select(
        F.lit("hot").alias("key"),
        (F.col("id") % 7_919).alias("v"))
    got = salted_count_distinct(df, "key", "v", factor=8).collect()
    assert [(r.key, r.n_distinct) for r in got] == [("hot", 7_919)]
