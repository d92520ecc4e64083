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


class _FakeState:
    """Minimal GroupState stand-in for driving the quota update function
    batch-by-batch without a streaming query."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


def test_quota_update_enforces_cap_across_batches():
    """Multi-batch semantics, driven directly: arrival order wins across
    batches, in-batch order is the id sort, and the admitted count per
    group never exceeds the cap no matter how arrivals are chopped."""
    import pandas as pd

    from replibyte_spark.streaming.quota import _make_update

    update = _make_update(3, "doc_id")
    state = _FakeState()

    def drive(ids):
        out = list(update(("en",), [pd.DataFrame({"doc_id": ids})], state))
        return sorted(out[0]["doc_id"].tolist()) if out else []

    # batch 1: 2 of 3 slots used, ids admitted in sorted order
    assert drive([10, 7]) == [7, 10]
    assert state.get == (2, 2)
    # batch 2: one slot left — the SMALLEST id of the batch takes it,
    # already-admitted earlier arrivals are never evicted
    assert drive([2, 1]) == [1]
    assert state.get == (3, 4)
    # batch 3: budget exhausted — nothing admitted, seen still advances
    assert drive([99]) == []
    assert state.get == (3, 5)


def test_quota_update_zero_cap_and_multiple_chunks():
    import pandas as pd

    import pytest as _pytest

    from replibyte_spark.streaming.quota import (_make_update,
                                                 streaming_group_quota)

    update = _make_update(0, "doc_id")
    state = _FakeState()
    assert list(update(("en",), [pd.DataFrame({"doc_id": [1]})], state)) == []
    assert state.get == (0, 1)

    # Arrow may hand a group as several chunks within one batch: the
    # budget must apply across chunks, id-sorted within each
    update = _make_update(3, "doc_id")
    state = _FakeState()
    chunks = [pd.DataFrame({"doc_id": [5, 4]}), pd.DataFrame({"doc_id": [3]})]
    out = pd.concat(list(update(("en",), chunks, state)))
    assert sorted(out["doc_id"].tolist()) == [3, 4, 5]
    assert state.get == (3, 3)

    # r12 ADVICE regression: when the budget is exhausted MID-batch, the
    # admitted SET must be the globally-smallest ids across ALL chunks —
    # a per-chunk sort would admit [4, 5] here and the result would
    # depend on where Arrow happened to split the group
    update = _make_update(2, "doc_id")
    state = _FakeState()
    out = pd.concat(list(update(("en",), chunks, state)))
    assert sorted(out["doc_id"].tolist()) == [3, 4]
    assert state.get == (2, 3)

    with _pytest.raises(ValueError):
        streaming_group_quota(None, -1)


def test_quota_schema_follows_input_types(spark, tmp_path):
    """r12 ADVICE: `corpus quota --group-col/--id-col` may point at any
    column types; the output/state row must derive from the input schema
    (int group + string id used to die in Arrow conversion against the
    hardcoded string/long pair)."""
    import uuid as _uuid

    from replibyte_spark.streaming.quota import streaming_group_quota

    src = str(tmp_path / "quota_typed_src")
    (spark.range(20)
     .select((F.col("id") % 3).cast("int").alias("grp"),
             F.concat(F.lit("d"), F.col("id")).alias("doc"))
     .coalesce(1).write.mode("overwrite").parquet(src))
    stream = (spark.readStream.schema("grp int, doc string").parquet(src))
    out = streaming_group_quota(stream, cap=4, group_col="grp",
                                id_col="doc")
    assert [f.dataType.simpleString() for f in out.schema.fields] == \
        ["int", "string"]
    name = f"quota_typed_{_uuid.uuid4().hex[:8]}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_qt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.table(name)
    counts = {r.grp: r["count"] for r in got.groupBy("grp").count().collect()}
    assert counts == {0: 4, 1: 4, 2: 4}
    # cap applies to the id-sorted head: group 0 has d0,d12,d15,d18,d21...
    # string sort => d0 < d12 < d15 < d18 < d3 < d6 < d9
    d0 = sorted(r.doc for r in got.filter("grp = 0").collect())
    assert d0 == ["d0", "d12", "d15", "d18"]


def test_dedup_stream_multibatch_rocksdb_matches_batch(spark, sf_dir,
                                                       tmp_path):
    """r14 verdict #6: keyed streaming state under the RocksDB state store
    on a genuinely multi-batch shape (3 files × maxFilesPerTrigger=1), with
    stream ≡ batch equivalence.  The provider choice must never change
    results — this locks that.  (The A/B MEASUREMENT on this shape, sf0.1 ×
    4 batches, read HDFSBacked 4.25/4.70 s vs RocksDB 5.67/5.84 s for
    dedup/running-totals — native DB open/commit per partition per batch
    dominates kilobytes of per-key state — so the DEFAULT provider stays
    HDFSBacked; see OPTIMIZATION_r15.md.  RocksDB is the 100 TB lever once
    state stops fitting executor heaps, and this test keeps the switch a
    one-conf change.)"""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from replibyte_spark.catalog import load_table
    from replibyte_spark.streaming.events import dedup_event_stream

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type")
    src = str(tmp_path / "rocks_src")
    for m in range(3):
        (events.filter(F.col("event_id") % 3 == m).coalesce(1)
         .write.mode("append").parquet(src))
    stream = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, "
                      "event_type string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    dd = dedup_event_stream(stream, ["user_id", "event_type"],
                            watermark="3650 days")
    name = f"rocks_{_uuid.uuid4().hex[:8]}"
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state."
                        "RocksDBStateStoreProvider")
    try:
        q = (dd.writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ckpt_rocks"))
             .trigger(availableNow=True).start())
        assert q.awaitTermination(180)
        assert q.lastProgress["batchId"] >= 2, "expected >= 3 micro-batches"
        got = (spark.table(name).groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("n")).orderBy("event_type")
               .collect())
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    want = (events.dropDuplicates(["user_id", "event_type"])
            .groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("event_type").collect())
    assert got == want
