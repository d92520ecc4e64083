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
