"""Multimodal operator tests: decode-stage plumbing (both codec branches),
byte-budget partitioning, frame-sampling fan-out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from replibyte_spark.catalog import load_table
from replibyte_spark.operators import multimodal as MM


def test_fake_decode_is_deterministic():
    a = MM._fake_decode(b"hello world")
    assert a == MM._fake_decode(b"hello world")
    w, h, c = a
    assert 1 <= w <= 2048 and 1 <= h <= 2048 and 1 <= c <= 4


def test_decode_images_fake_branch(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    mm = MM.attach_binary_content(docs)
    out = MM.decode_images(mm, use_real_codec=False).collect()
    assert len(out) == 20
    assert all(r.mime == "image/fake" and r.n_pixels == r.width * r.height
               for r in out)


def test_decode_images_real_codec_requires_pil(spark, sf_dir):
    """use_real_codec=True must fail FAST on the driver when PIL is absent
    (not mid-job on an executor)."""
    try:
        import PIL.Image  # noqa: F401
        pytest.skip("PIL installed; covered by the real-codec test")
    except ImportError:
        pass
    docs = load_table(spark, sf_dir, "documents").limit(1)
    mm = MM.attach_binary_content(docs)
    with pytest.raises(ImportError):
        MM.decode_images(mm, use_real_codec=True)


def test_decode_images_real_codec_with_pil(spark):
    """REAL branch: decode an actual PNG via PIL (skipped where the
    container lacks the codec — the branch itself is live code)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    PIL_Image.new("RGB", (12, 7)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame([(1, bytearray(png))],
                               "doc_id long, content binary")
    row = MM.decode_images(df, use_real_codec=True).collect()[0]
    assert (row.mime, row.width, row.height, row.n_channels) == \
        ("image/png", 12, 7, 3)
    assert row.n_pixels == 84


def test_repartition_for_binary_targets_byte_budget(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.repeat(F.lit("x"), 1000).cast("binary").alias("content"))
    out = MM.repartition_for_binary(df, "content",
                                    target_partition_bytes=100_000,
                                    sample_fraction=0.5)
    # ~1 MB total / 100 KB budget → ~10 partitions (sampling slack allowed)
    assert 5 <= out.rdd.getNumPartitions() <= 20
    assert out.count() == 1000


def test_sample_frames_fan_out(spark):
    df = spark.createDataFrame([(1, bytearray(b"a" * 200)),
                                (2, bytearray(b"b" * 10))],
                               "doc_id long, content binary")
    out = MM.sample_frames(df, every_n_bytes=64, max_frames=8).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert sorted(per_doc[1]) == [0, 1, 2]   # 200 // 64 = 3 windows
    assert sorted(per_doc[2]) == [0]         # short payload → 1 window


def test_decode_audio_real_wav_via_stdlib(spark):
    """REAL audio branch: a genuine WAV payload decodes through the stdlib
    wave module — correct rate/channels/frames/duration."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"\x00\x01" * 2 * 8000)  # 8000 frames = 500 ms
    payload = buf.getvalue()
    df = spark.createDataFrame([(1, bytearray(payload)),
                                (2, bytearray(b"not a wav"))],
                               "doc_id long, content binary")
    rows = {r.doc_id: r for r in MM.decode_audio(df).collect()}
    real = rows[1]
    assert (real.codec, real.sample_rate, real.n_channels,
            real.n_frames, real.duration_ms) == ("audio/wav", 16000, 2,
                                                 8000, 500)
    assert rows[2].codec == "audio/fake"


def test_payload_fingerprints_match_hashlib(spark):
    import hashlib

    payloads = [b"", b"abc", b"\x00\xff\x10" * 40, "unicode 🙂".encode()]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, content binary")
    rows = {r.doc_id: r for r in MM.payload_fingerprints(df).collect()}
    for i, p in enumerate(payloads):
        assert rows[i].payload_md5 == hashlib.md5(p).hexdigest()
        assert rows[i].payload_bytes == len(p)


def test_dedup_binary_exact_keeps_min_id_per_payload(spark):
    rows = [(5, b"dup"), (2, b"dup"), (9, b"dup"),
            (3, b"unique"), (7, b"\x00\x00"), (8, b"\x00\x00")]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows],
        "doc_id long, content binary")
    kept = sorted(r.doc_id for r in MM.dedup_binary_exact(df).collect())
    assert kept == [2, 3, 7]
    out = MM.dedup_binary_exact(df)
    assert out.columns == ["doc_id", "content"]


def test_dedup_binary_exact_keeps_null_payloads(spark):
    """r11 ADVICE fix: md5(NULL) is NULL, and the null-unsafe semi-join
    used to silently DROP every NULL-payload row — they must all be
    kept (no content means nothing to be a duplicate of), while the
    non-null dedup is unaffected."""
    df = spark.createDataFrame(
        [(1, bytearray(b"dup")), (2, bytearray(b"dup")),
         (3, None), (4, None)],
        "doc_id long, content binary")
    kept = sorted(r.doc_id for r in MM.dedup_binary_exact(df).collect())
    assert kept == [1, 3, 4]


def test_dedup_binary_plan_has_no_nested_loop(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))],
                               "doc_id long, content binary")
    plan = MM.dedup_binary_exact(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan and "BatchEval" not in plan
