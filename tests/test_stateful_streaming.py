"""Custom stateful operator: state must survive ACROSS micro-batches and the
final emission must equal the batch aggregate."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F


def test_stateful_running_totals_across_batches(spark, sf_dir, tmp_path):
    from replibyte_spark.catalog import load_table
    from replibyte_spark.streaming.stateful import running_user_totals

    events = load_table(spark, sf_dir, "events").select("user_id", "value", "event_id")
    # split into 2 files so availableNow + maxFilesPerTrigger=1 yields
    # 2 micro-batches -> state genuinely crosses a batch boundary
    src = str(tmp_path / "stream_src")
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.mode("overwrite").parquet(src)
    second.coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema("user_id long, value double, event_id long")
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = running_user_totals(stream)
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)

    emitted = spark.table(name)
    assert emitted.count() > 0
    # more than one micro-batch ran: some user must have been emitted twice
    multi = (emitted.groupBy("user_id").count().filter("count > 1").count())
    assert multi > 0, "expected at least one user updated across two batches"
    # final (max n_events) emission per user == batch ground truth
    final = (emitted.groupBy("user_id")
             .agg(F.max_by("sum_value", "n_events").alias("sum_value"),
                  F.max("n_events").alias("n_events")))
    truth = (events.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.round(F.sum("value"), 2).alias("sum_value")))
    got = {r.user_id: (r.n_events, r.sum_value) for r in final.collect()}
    want = {r.user_id: (r.n_events, r.sum_value) for r in truth.collect()}
    assert got == want
