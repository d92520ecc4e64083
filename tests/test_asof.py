"""As-of join vs DuckDB's NATIVE ASOF JOIN — two independent implementations
of the same semantics must agree on real data."""

from __future__ import annotations

import duckdb

from replibyte_spark.catalog import load_table
from replibyte_spark.operators.asof import asof_join
from pyspark.sql import functions as F


def test_asof_matches_duckdb_native(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter("event_type = 'purchase'").select("event_id", "user_id", "ts")
    clicks = ev.filter("event_type = 'click'").select("user_id", "ts", "event_id")
    got = asof_join(purchases, clicks, on="user_id",
                    right_payload=["event_id"]).orderBy("event_id")
    rows = sorted((r.event_id, r.user_id, r.ts, r.ts_matched, r.event_id_matched)
                  for r in got.collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = sorted(map(tuple, con.execute("""
        WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
             c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
        SELECT p.event_id, p.user_id, p.ts, c.ts, c.event_id
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """).fetchall()))
    assert rows == want and len(rows) > 0


def test_asof_basic_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 101), (2, 5, 102)], "k long, t long, lid long"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "lid")
    right = spark.createDataFrame(
        [(1, 10, 7.0), (1, 15, 8.0), (2, 9, 9.0)], "k long, t long, v double"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "v")
    out = {r.lid: (r.v_matched,)
           for r in asof_join(left, right, on="k").collect()}
    assert out[100] == (7.0,)   # inclusive: right.ts == left.ts matches
    assert out[101] == (8.0,)   # latest prior
    assert out[102] == (None,)  # right only has future rows → NULL


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, 100, 1)], "k long, t long, lid long") \
        .select("k", F.timestamp_seconds("t").alias("ts"), "lid")
    right = spark.createDataFrame([(1, 10, 5.0)], "k long, t long, v double") \
        .select("k", F.timestamp_seconds("t").alias("ts"), "v")
    loose = asof_join(left, right, on="k").first()
    tight = asof_join(left, right, on="k", tolerance_seconds=30).first()
    assert loose.v_matched == 5.0
    assert tight.v_matched is None and tight.ts_matched is None


def test_asof_null_payload_not_torn(spark):
    """A right row with a NULL payload must win as the latest match WITH its
    own NULL — not borrow an older row's payload (the torn-match bug)."""
    from pyspark.sql import functions as F

    from replibyte_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100)], "k long, ts long").select(
        "k", F.timestamp_seconds("ts").alias("ts"))
    right = spark.createDataFrame(
        [(1, 10, "old"), (1, 50, None)], "k long, ts long, v string").select(
        "k", F.timestamp_seconds("ts").alias("ts"), "v")
    row = asof_join(left, right, on="k").collect()[0]
    assert row.ts_matched.second == 50 or row.ts_matched.minute == 0
    # matched timestamp is the newest right row (t=50)...
    import datetime
    assert row.ts_matched == datetime.datetime(1970, 1, 1, 0, 0, 50)
    # ...and the payload is THAT row's NULL, not "old"
    assert row.v_matched is None


def test_asof_null_keys_never_match(spark):
    """NULL join keys must not match each other (standard join / DuckDB
    ASOF semantics): the union-window plan partitions NULL keys together,
    so without the output mask a NULL-keyed left row would pick up a
    NULL-keyed right row's payload."""
    left = spark.createDataFrame(
        [(None, 100, 1), (1, 100, 2)], "k long, t long, lid long"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "lid")
    right = spark.createDataFrame(
        [(None, 50, 7.0), (1, 50, 8.0)], "k long, t long, v double"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "v")
    out = {r.lid: (r.v_matched, r.ts_matched)
           for r in asof_join(left, right, on="k").collect()}
    assert out[1] == (None, None)          # NULL key: no match
    assert out[2][0] == 8.0                # real key still matches


def test_asof_subsecond_tolerance_exact(spark):
    """Tolerance compares exact microseconds, not per-side second-truncated
    values: a 0.8s-old match fails tolerance 0.5 (truncation said 0 <= 0.5)
    and a 0.1s-old match passes (truncation said 1 > 0.5)."""
    left = spark.createDataFrame(
        [(1, 10.9, 1), (2, 10.0, 2)], "k long, t double, lid long"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "lid")
    right = spark.createDataFrame(
        [(1, 10.1, 7.0), (2, 9.9, 9.0)], "k long, t double, v double"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "v")
    out = {r.lid: r.v_matched
           for r in asof_join(left, right, on="k",
                              tolerance_seconds=0.5).collect()}
    assert out[1] is None                  # 0.8s stale: discarded
    assert out[2] == 9.0                   # 0.1s fresh: kept
