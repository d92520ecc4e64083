"""Banded range join: band-boundary correctness (the failure mode of banding
bugs is exactly at band edges)."""

from __future__ import annotations

from pyspark.sql import functions as F

from replibyte_spark.operators.rangejoin import trailing_window_count


def _ts(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return df.select(*[F.timestamp_seconds(F.col(c)).alias(c) if c == "ts" else F.col(c)
                       for c in df.columns])


def test_band_boundaries_inclusive(spark):
    w = 100
    left = _ts(spark, [(1, 1000, 10)], "k long, ts long, lid long")
    # rights at: exactly lts (in), exactly lts-w (in), lts-w-1 (out),
    # lts+1 (out/future), far past band boundary but in window (in)
    right = _ts(spark, [(1, 1000), (1, 900), (1, 899), (1, 1001), (1, 901)],
                "k long, ts long")
    out = trailing_window_count(left, right, on="k", window_seconds=w).first()
    assert out.n_in_window == 3  # 1000, 900, 901


def test_no_match_counts_zero(spark):
    left = _ts(spark, [(1, 1000, 1), (2, 1000, 2)], "k long, ts long, lid long")
    right = _ts(spark, [(1, 500)], "k long, ts long")
    out = {r.lid: r.n_in_window
           for r in trailing_window_count(left, right, on="k", window_seconds=100).collect()}
    assert out == {1: 0, 2: 0}


def test_no_double_count_across_replicas(spark):
    """A right row replicated into two bands must count at most once."""
    w = 100
    left = _ts(spark, [(1, 150, 1)], "k long, ts long, lid long")
    right = _ts(spark, [(1, 120)], "k long, ts long")  # same band as left
    out = trailing_window_count(left, right, on="k", window_seconds=w).first()
    assert out.n_in_window == 1


def test_duplicate_left_rows_each_produce_output(spark):
    """Two identical left rows must yield two rows with their own counts,
    not one collapsed row with a doubled count."""
    from pyspark.sql import functions as F

    from replibyte_spark.operators.rangejoin import trailing_window_count

    left = spark.createDataFrame([(1, 100), (1, 100)], "k long, ts long") \
        .select("k", F.timestamp_seconds("ts").alias("ts"))
    right = spark.createDataFrame([(1, 80)], "k long, ts long") \
        .select("k", F.timestamp_seconds("ts").alias("ts"))
    out = trailing_window_count(left, right, on="k",
                                window_seconds=3600).collect()
    assert len(out) == 2
    assert [r.n_in_window for r in out] == [1, 1]


def test_fractional_window_counts_correctly(spark):
    """window_seconds=0.5 must honor the true half-second window — the old
    int() truncation made the window 0 wide, NULLed every band
    (floor(ts/0)), and returned 0 for every row."""
    left = _ts(spark, [(1, 1000.0, 1)], "k long, ts double, lid long")
    right = _ts(spark, [(1, 1000.0), (1, 999.6), (1, 999.4), (1, 1000.2)],
                "k long, ts double")
    out = trailing_window_count(left, right, on="k",
                                window_seconds=0.5).first()
    assert out.n_in_window == 2            # 1000.0 and 999.6 only

    import pytest
    with pytest.raises(ValueError):
        trailing_window_count(left, right, on="k", window_seconds=0)
