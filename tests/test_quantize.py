"""int8 scalar quantization (operators/quantize.py): reconstruction bound,
zero-vector edge, recall + exact-cosine agreement vs brute force, and the
column-pruning plan shape on a materialized code layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from replibyte_spark.operators.quantize import (Q_MAX, quantize_vectors,
                                                quantized_brute_topk)
from replibyte_spark.operators.similarity import brute_force_topk


def test_reconstruction_error_within_half_step(spark):
    rows = [(1, [0.31, -0.7, 0.005, 1.9]), (2, [-3.2, 0.0, 0.1, 0.2])]
    out = quantize_vectors(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"))
    for r in out.collect():
        scale = r["qscale"]
        assert scale > 0
        assert max(abs(c) for c in r["q"]) <= Q_MAX
        for x, c in zip(r["embedding"], r["q"]):
            assert abs(c * scale - x) <= scale / 2 + 1e-12


def test_zero_vector_gets_zero_codes(spark):
    out = quantize_vectors(spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"))
    r = out.collect()[0]
    assert r["qscale"] == 0.0 and r["q"] == [0, 0, 0] and r["norm"] == 0.0


def test_recall_and_exact_cosines_vs_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    exact = brute_force_topk(emb, queries, k=5)
    quant = quantized_brute_topk(emb, queries, k=5, expand=4)
    ex = {(r["query_id"], r["neighbor_id"]): r["cosine"]
          for r in exact.collect()}
    qu = {(r["query_id"], r["neighbor_id"]): r["cosine"]
          for r in quant.collect()}
    hits = sum(1 for p in qu if p in ex)
    recall = hits / len(ex)
    assert recall >= 0.9, f"recall@5 {recall}"
    # the re-rank is exact: every agreeing pair reports the identical cosine
    for p in qu:
        if p in ex:
            assert qu[p] == ex[p]


def test_precomputed_codes_are_consumed(spark):
    """A corpus already carrying (q, qscale, norm) skips requantization —
    results identical either way."""
    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)])
            for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pre = quantize_vectors(emb)
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    a = sorted(map(tuple, quantized_brute_topk(emb, queries, 3).collect()))
    b = sorted(map(tuple, quantized_brute_topk(pre, queries, 3).collect()))
    assert a == b


def test_materialized_layout_prunes_fp_column(spark, tmp_path, sf_dir):
    """With codes persisted, the candidate scan's parquet read must NOT
    include the fp embedding column — the 4× bandwidth claim, in the plan."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "qcorpus.parquet")
    quantize_vectors(emb).write.parquet(path)
    corpus = spark.read.parquet(path)
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    plan = quantized_brute_topk(corpus, queries, k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    # identify the corpus scans by exclusion (toString truncates long tmp
    # paths, so matching the qcorpus filename is unreliable)
    scans = [ln for ln in plan.splitlines()
             if "FileScan" in ln and "testdata" not in ln]
    assert len(scans) == 2, plan
    code_scans = [s for s in scans if "embedding" not in s.split(
        "ReadSchema:")[-1]]
    fp_scans = [s for s in scans if "embedding" in s.split(
        "ReadSchema:")[-1] and "q:" not in s.split("ReadSchema:")[-1]]
    assert len(code_scans) == 1, scans   # approx scan: codes only
    assert len(fp_scans) == 1, scans     # re-rank scan: fp only


def test_ivf_quantized_matches_ivf_exact_on_fixture(spark, sf_dir):
    """IVF-SQ8 probes the same cells as ivf_topk; with expand=4 on the
    fixture the final top-k should agree with the exact IVF path almost
    everywhere, and every agreeing pair reports the identical cosine."""
    from replibyte_spark.operators.quantize import ivf_topk_quantized
    from replibyte_spark.operators.similarity import (default_centroids,
                                                      ivf_topk)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    cents = [(r["centroid_id"], [float(x) for x in r["cv"]])
             for r in default_centroids(emb, 16).collect()]
    exact = {(r["query_id"], r["neighbor_id"]): r["cosine"]
             for r in ivf_topk(emb, queries, k=5, n_probe=2,
                               centroids=cents).collect()}
    quant = {(r["query_id"], r["neighbor_id"]): r["cosine"]
             for r in ivf_topk_quantized(emb, queries, cents, k=5,
                                         n_probe=2, expand=4).collect()}
    hits = sum(1 for p in quant if p in exact)
    assert hits / len(exact) >= 0.9, hits / len(exact)
    for p in quant:
        if p in exact:
            assert quant[p] == exact[p]


def test_ivf_quantized_empty_centroids(spark):
    from replibyte_spark.operators.quantize import ivf_topk_quantized

    emb = spark.createDataFrame([(1, [1.0, 0.0])],
                                "vec_id long, embedding array<double>")
    out = ivf_topk_quantized(emb, emb, [], k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]


def test_quantized_index_layout_roundtrip(spark, tmp_path, sf_dir):
    """build_ann_index(quantize=True) stores codes; the loaded corpus is
    consumed as-is by ivf_topk_quantized (identical results to on-the-fly
    quantization), appends mirror the layout, meta records the flag."""
    from replibyte_spark.operators.quantize import ivf_topk_quantized
    from replibyte_spark.operators.similarity import (append_ann_index,
                                                      build_ann_index,
                                                      load_ann_index,
                                                      load_ann_index_meta)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    head = emb.filter(F.col("vec_id") < 400)
    tail = emb.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "qidx")
    cents = build_ann_index(head, path, bits=4, dim=64, quantize=True)
    meta = load_ann_index_meta(spark, path, use_cache=False)
    assert meta["quantized"] is True
    corpus, _ = load_ann_index(spark, path, with_centroids=False)
    assert {"q", "qscale", "norm", "centroid_id"} <= set(corpus.columns)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    from_layout = sorted(map(tuple, ivf_topk_quantized(
        corpus, queries, cents, k=3, n_probe=2).collect()))
    on_the_fly = sorted(map(tuple, ivf_topk_quantized(
        head.select("vec_id", "embedding"), queries, cents, k=3,
        n_probe=2).collect()))
    assert from_layout == on_the_fly
    # append mirrors the quantized schema — reload still reads cleanly
    append_ann_index(tail, path)
    corpus2, _ = load_ann_index(spark, path, with_centroids=False)
    assert corpus2.count() == emb.count()
    assert corpus2.filter(F.col("q").isNull()).count() == 0
