"""Semantic-clustering operators (SemDeDup within-cluster dedup,
cluster-balanced sampling, cluster profile): semantic invariants checked
against a NumPy ground truth, plus the plan shapes the 100 TB story
depends on (assignment fused into the scan, no cartesian products)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from replibyte_spark.catalog import load_table
from replibyte_spark.operators import clustering as C
from replibyte_spark.operators.similarity import ivf_assign

N_CLUSTERS = 8
T = 0.35


def _ground_truth(spark, sf_dir):
    """id -> (cluster, md5 keep-key, unit vector) via the operator's own
    assignment (trusted separately by the oracle-checked IVF gates)."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows = ivf_assign(emb, N_CLUSTERS).select(
        "vec_id", "embedding", "centroid_id",
        F.md5(F.col("vec_id").cast("string")).alias("m")).collect()
    out = {}
    for r in rows:
        v = np.array(r.embedding, dtype=float)
        out[r.vec_id] = (r.centroid_id, r.m, v / np.linalg.norm(v))
    return emb, out


def test_semdedup_flags_match_numpy_ground_truth(spark, sf_dir):
    """A vector is flagged iff some strictly-earlier (md5 keep-order)
    cluster-mate has cosine >= T — checked exhaustively in NumPy."""
    emb, gt = _ground_truth(spark, sf_dir)
    flagged = {r.vec_id: r for r in
               C.semantic_cluster_dup_pairs(emb, T, N_CLUSTERS).collect()}
    for vid, (cell, m, v) in gt.items():
        earlier = [(oid, ov) for oid, (ocell, om, ov) in gt.items()
                   if ocell == cell and (om, oid) < (m, vid)]
        hits = [(oid, round(float(v @ ov), 6)) for oid, ov in earlier
                if round(float(v @ ov), 6) >= T]
        if hits:
            assert vid in flagged, f"{vid} should be flagged ({hits})"
            top = max(h[1] for h in hits)
            assert flagged[vid].cosine == top
            assert flagged[vid].dup_of in [h[0] for h in hits if h[1] == top]
        else:
            assert vid not in flagged, f"{vid} wrongly flagged"


def test_semdedup_survivors_partition_the_corpus(spark, sf_dir):
    emb, _ = _ground_truth(spark, sf_dir)
    n = emb.count()
    flagged = C.semantic_cluster_dup_pairs(emb, T, N_CLUSTERS)
    survivors = C.semantic_cluster_dedup(emb, T, N_CLUSTERS)
    f_ids = {r.vec_id for r in flagged.collect()}
    s_ids = {r.vec_id for r in survivors.collect()}
    assert f_ids.isdisjoint(s_ids)
    assert len(f_ids) + len(s_ids) == n
    # every flagged vector's keeper survived OR was itself flagged by an
    # even earlier keeper (transitive chains are allowed; the chain root
    # always survives)
    roots = {r.dup_of for r in flagged.collect()} - f_ids
    assert roots <= s_ids


def test_cluster_balanced_sample_quota_and_determinism(spark, sf_dir):
    emb, gt = _ground_truth(spark, sf_dir)
    cap = 5
    s1 = C.cluster_balanced_sample(emb, cap, N_CLUSTERS)
    got = [(r.vec_id, r.centroid_id) for r in s1.collect()]
    sizes: dict[str, int] = {}
    for vid, cell in got:
        assert gt[vid][0] == cell
        sizes[cell] = sizes.get(cell, 0) + 1
    assert all(v <= cap for v in sizes.values())
    # every cell with >= cap members contributes exactly cap
    full = {c for c in sizes
            if sum(1 for g in gt.values() if g[0] == c) >= cap}
    assert all(sizes[c] == cap for c in full)
    # deterministic keep-order: the cap lowest (md5, id) per cell
    for cell in sizes:
        members = sorted(((m, vid) for vid, (c, m, _) in gt.items()
                          if c == cell))
        want = {vid for _, vid in members[:cap]}
        assert {vid for vid, c in got if c == cell} == want
    s2 = [(r.vec_id, r.centroid_id)
          for r in C.cluster_balanced_sample(emb, cap, N_CLUSTERS).collect()]
    assert sorted(s2) == sorted(got)


def test_cluster_profile_covers_corpus(spark, sf_dir):
    emb, gt = _ground_truth(spark, sf_dir)
    prof = C.cluster_profile(emb, N_CLUSTERS).collect()
    assert sum(r.n_members for r in prof) == len(gt)
    assert len(prof) <= N_CLUSTERS
    for r in prof:
        assert -1.0 <= r.mean_cosine <= 1.0


def test_clustering_plan_shapes(spark, sf_dir):
    """Assignment is a literal-inlined projection: the balanced sample has
    exactly ONE Exchange (the per-cell window) and no join; the SemDeDup
    pair join is an equi-join on centroid_id, never a cartesian."""
    emb = load_table(spark, sf_dir, "embeddings")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    p_sample = plan(C.cluster_balanced_sample(emb, 5, N_CLUSTERS))
    assert "Join" not in p_sample and "CartesianProduct" not in p_sample
    # fan_out repartition + the window's hash partitioning
    assert p_sample.count("Exchange") <= 2

    p_pairs = plan(C.semantic_cluster_dup_pairs(emb, T, N_CLUSTERS))
    assert "CartesianProduct" not in p_pairs
    assert "centroid_id" in p_pairs


def test_semdedup_is_idempotent_under_frozen_centroids(spark, sf_dir):
    """A survivor had no earlier >=T cluster-mate in the FULL corpus, so it
    cannot acquire one in the survivor subset — PROVIDED the second pass
    reuses the first pass's centroids (recomputing default centroids from
    the survivor subset could reshuffle cells; freezing them is the same
    contract the materialized ANN index's append path documents)."""
    from replibyte_spark.operators.similarity import default_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = [(r.centroid_id, [float(x) for x in r.cv])
             for r in default_centroids(emb, N_CLUSTERS).collect()]
    s1 = C.semantic_cluster_dedup(emb, T, N_CLUSTERS, centroids=cents)
    flags2 = C.semantic_cluster_dup_pairs(s1, T, N_CLUSTERS, centroids=cents)
    assert flags2.count() == 0
    s2 = C.semantic_cluster_dedup(s1, T, N_CLUSTERS, centroids=cents)
    assert s2.count() == s1.count()
