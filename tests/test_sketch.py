"""Sketch-based dataset-overlap estimation (operators/sketch.py):
estimator identities on constructed corpora, accuracy vs the exact path
on the fixture, and the missing-grams edge."""

from __future__ import annotations

from pyspark.sql import functions as F

from replibyte_spark.operators.sketch import (group_minhash_signatures,
                                              group_overlap_matrix,
                                              group_shingle_jaccard,
                                              sketch_overlap_pairs)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_identical_groups_estimate_one(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta"
    df = _mk(spark, [(1, "g1", text), (2, "g2", text)])
    out = group_overlap_matrix(df, "source", "text", exact=True).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a"], r["b"]) == ("g1", "g2")
    assert r["est_jaccard"] == 1.0
    assert r["jaccard"] == 1.0


def test_disjoint_groups_estimate_near_zero(spark):
    df = _mk(spark, [
        (1, "g1", "aa bb cc dd ee ff gg hh"),
        (2, "g2", "xx yy zz ww vv uu tt ss"),
    ])
    r = group_overlap_matrix(df, "source", "text", exact=True).collect()[0]
    assert r["jaccard"] == 0.0
    assert r["est_jaccard"] <= 0.2      # collisions possible, overlap is not


def test_group_union_is_set_level(spark):
    """The group signature must hash the UNION of its docs' shingles —
    duplicated shingles across docs change nothing."""
    base = "one two three four five six"
    df_dup = _mk(spark, [(1, "g", base), (2, "g", base), (3, "h", base)])
    df_one = _mk(spark, [(1, "g", base), (3, "h", base)])
    sig_dup = group_minhash_signatures(df_dup, "source").collect()
    sig_one = group_minhash_signatures(df_one, "source").collect()
    assert sorted(map(tuple, sig_dup)) == sorted(map(tuple, sig_one))


def test_fixture_estimate_tracks_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = group_overlap_matrix(docs, "source", "text", exact=True).collect()
    n_groups = docs.select("source").distinct().count()
    assert len(rows) == n_groups * (n_groups - 1) // 2
    errs = [abs(r["est_jaccard"] - r["jaccard"]) for r in rows]
    # 16 hashes -> std error sqrt(J(1-J)/16) <= 0.125; mean |err| across
    # 190 pairs collapses far below a single pair's worst case
    assert sum(errs) / len(errs) < 0.12, sum(errs) / len(errs)
    assert max(errs) < 0.45, max(errs)


def test_groups_without_grams_are_absent(spark):
    df = _mk(spark, [(1, "g1", "only two"),            # < 3 tokens: no 3-gram
                     (2, "g2", "alpha beta gamma delta"),
                     (3, "g3", "alpha beta gamma epsilon")])
    sigs = group_minhash_signatures(df, "source")
    assert {r["source"] for r in sigs.collect()} == {"g2", "g3"}
    out = group_overlap_matrix(df, "source", "text", exact=True).collect()
    assert {(r["a"], r["b"]) for r in out} == {("g2", "g3")}


def test_exact_pairs_include_zero_intersection(spark):
    df = _mk(spark, [(1, "g1", "a b c d"), (2, "g2", "x y z w")])
    r = group_shingle_jaccard(df, "source", "text").collect()
    assert [(x["a"], x["b"], x["jaccard"]) for x in r] == [("g1", "g2", 0.0)]


def test_n_hashes_cap(spark):
    df = _mk(spark, [(1, "g1", "a b c d")])
    sigs = group_minhash_signatures(df, "source")
    try:
        sketch_overlap_pairs(sigs, "source", n_hashes=99)
    except ValueError as e:
        assert "n_hashes" in str(e)
    else:
        raise AssertionError("expected ValueError for n_hashes > family")


def test_signature_doc_partition_invariance(spark):
    """The group signature is a set-level min: splitting a group's text
    across more docs (or partitions) must not change it."""
    text = "w1 w2 w3 w4 w5 w6 w7 w8"
    one = _mk(spark, [(1, "g", text)])
    # same token stream split across two docs with overlapping windows
    many = _mk(spark, [(1, "g", "w1 w2 w3 w4 w5"),
                       (2, "g", "w3 w4 w5 w6 w7 w8")]).repartition(5)
    s1 = sorted(map(tuple, group_minhash_signatures(one, "source").collect()))
    s2 = sorted(map(tuple, group_minhash_signatures(many, "source").collect()))
    assert s1 == s2


def test_estimate_is_agreement_fraction(spark):
    """est_jaccard must equal (agreeing hashes)/n_hashes computed from the
    signatures themselves — locks the arithmetic, not just the oracle."""
    df = _mk(spark, [(1, "g1", "a b c d e f"), (2, "g2", "c d e f g h")])
    sigs = {r["source"]: [r[f"h{i}"] for i in range(16)]
            for r in group_minhash_signatures(df, "source").collect()}
    agree = sum(x == y for x, y in zip(sigs["g1"], sigs["g2"]))
    est = sketch_overlap_pairs(
        group_minhash_signatures(df, "source"), "source").collect()[0]
    assert est["est_jaccard"] == round(agree / 16, 6)
