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
