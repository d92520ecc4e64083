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


def test_streaming_gopher_flags_match_batch(spark, sf_dir, tmp_path):
    """r10: gopher_flags is a pure projection, so the SAME call bolts
    onto a Structured Streaming micro-batch pipeline unchanged — the
    per-source pass counts of an availableNow stream over the documents
    table equal the batch result exactly (stream ≡ batch, the repo's
    streaming-curation contract extended to the rule filter)."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from replibyte_spark.functions.gopher import gopher_flags

    schema = ("doc_id long, text string, lang string, source string, "
              "n_chars long")
    path = os.path.join(sf_dir, "documents.parquet")
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", os.path.basename(path))
              .parquet(os.path.dirname(path)))

    def summarize(df):
        return (gopher_flags(df)
                .groupBy("source")
                .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                     F.sum(F.when(F.col("gopher_pass"), 1).otherwise(0))
                     .cast("long").alias("n_pass")))

    name = f"gq_stream_{uuid.uuid4().hex[:8]}"
    q = (summarize(stream).writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table(name).collect()))
    want = sorted(map(tuple, summarize(
        spark.read.parquet(path)).collect()))
    assert got == want and len(got) > 0
