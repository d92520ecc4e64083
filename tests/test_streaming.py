"""Streaming ≡ batch: the same unified plan run as an actual Structured
Streaming query (file source, availableNow trigger, memory sink) must produce
exactly the batch result the DuckDB oracle validates."""

from __future__ import annotations


def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    from replibyte_spark.streaming.events import (
        batch_hourly_counts,
        streaming_hourly_counts,
    )

    batch = batch_hourly_counts(spark, sf_dir)
    stream = streaming_hourly_counts(spark, sf_dir, str(tmp_path / "ckpt"))
    got = sorted(map(tuple, stream.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) > 0


def test_stream_is_incremental(spark, sf_dir, tmp_path):
    """The stream must actually run as a streaming query (isStreaming) and
    respect the file-source schema."""
    import os

    from replibyte_spark.streaming.events import read_event_stream

    s = read_event_stream(spark, os.path.join(sf_dir, "events.parquet"))
    assert s.isStreaming
    assert set(s.columns) == {"event_id", "ts", "user_id", "event_type",
                              "value", "props"}


def test_sliding_window_stream_matches_batch(spark, sf_dir, tmp_path):
    import os
    import uuid

    from replibyte_spark.catalog import load_table
    from replibyte_spark.streaming.events import (
        read_event_stream,
        sliding_window_counts,
    )

    batch = sliding_window_counts(load_table(spark, sf_dir, "events"))
    stream = read_event_stream(spark, os.path.join(sf_dir, "events.parquet"))
    agg = sliding_window_counts(stream)
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt_slide"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table(name).collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) > 0


def test_streaming_dedup_matches_batch_keys(spark, sf_dir, tmp_path):
    """Watermark-bounded streaming dedup must keep exactly the batch-distinct
    key set (which duplicate survives is arbitrary — keys are the contract)."""
    import os
    import uuid

    from replibyte_spark.catalog import load_table
    from replibyte_spark.streaming.events import (
        dedup_event_stream,
        read_event_stream,
    )

    keys = ["user_id", "event_type"]
    ev = load_table(spark, sf_dir, "events")
    want = {tuple(r) for r in ev.select(*keys).distinct().collect()}

    stream = read_event_stream(spark, os.path.join(sf_dir, "events.parquet"))
    dd = dedup_event_stream(stream, keys, watermark="1 day")
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (dd.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    got_rows = spark.table(name).select(*keys).collect()
    got = {tuple(r) for r in got_rows}
    assert got == want
    assert len(got_rows) == len(got)  # no key emitted twice
