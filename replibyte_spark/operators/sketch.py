"""Sketch-based dataset-overlap estimation.

"How much does source/shard/snapshot A overlap source B?" is a routine
curation question (mixing weights, crawl-snapshot dedup planning, buying
decisions for a data vendor's corpus) whose exact answer at 100 TB — the
pairwise Jaccard of distinct-shingle SETS — needs a corpus-wide
distinct-gram self-join.  The sketch answer needs one scan:

1. per group, a MinHash signature over its shingle set — the same
   md5-derived hash family the document-level dedup uses
   (:func:`~.dedup.minhash_sql`), aggregated with `min()` so the explode
   feeds straight into a partial-agg groupBy (the word-count shape; the
   Zipf head collapses map-side);
2. the estimate: for groups A and B, P(min_h(A) = min_h(B)) = J(A, B) per
   independent hash (the MinHash property), so the AGREEMENT FRACTION of
   their signatures is an unbiased Jaccard estimate with std error
   ~ sqrt(J(1-J)/k) at k hashes.

The signature table is |groups| rows — corpus metadata, joinable on the
driver; the pairwise comparison is |groups|² over a broadcast, never a
corpus-scale shuffle.  Everything is md5-deterministic, so the DuckDB
oracle reproduces estimates bit-for-bit, and the exact path
(:func:`group_shingle_jaccard`) stays available as the small-scale
verification oracle for the estimator's accuracy (tests assert the
estimate lands within the binomial error bound of exact)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import dialect as D
from .dedup import (_MINHASH_A, _exploded_grams, minhash_signatures,
                    upper_triangle_pairs)


def group_minhash_signatures(df: DataFrame, group_col: str = "source",
                             text_col: str = "text", n_hashes: int = 16,
                             n: int = 3) -> DataFrame:
    """(group, h0..h{k-1}) — one MinHash signature per GROUP's shingle
    set (the union of its documents' shingles; min() over the group is
    exactly the set-level minimum).  Identical hash family and plan shape
    as the document-level :func:`~.dedup.minhash_signatures`."""
    return minhash_signatures(df, group_col, text_col, n_hashes, n)


def sketch_overlap_pairs(sigs: DataFrame, group_col: str,
                         n_hashes: int = 16) -> DataFrame:
    """(a, b, est_jaccard) for every unordered group pair from a
    signature table.  |groups|² pairs over a broadcast cross join — the
    signature table is bounded corpus metadata, so the quadratic term
    never touches corpus-scale data."""
    if n_hashes > len(_MINHASH_A):
        raise ValueError(f"n_hashes must be <= {len(_MINHASH_A)}")
    left = sigs.select(F.col(group_col).alias("a"),
                       *[F.col(f"h{i}").alias(f"xa{i}")
                         for i in range(n_hashes)])
    right = sigs.select(F.col(group_col).alias("b"),
                        *[F.col(f"h{i}").alias(f"xb{i}")
                          for i in range(n_hashes)])
    agree = " + ".join(
        f"(CASE WHEN xa{i} = xb{i} THEN 1 ELSE 0 END)"
        for i in range(n_hashes))
    return (F.broadcast(left).crossJoin(right)
            .filter(F.col("a") < F.col("b"))
            .select("a", "b",
                    F.expr(f"round(({agree}) / {float(n_hashes)!r}D, 6)")
                    .alias("est_jaccard")))


def group_shingle_jaccard(df: DataFrame, group_col: str = "source",
                          text_col: str = "text", n: int = 3) -> DataFrame:
    """(a, b, jaccard) EXACT pairwise Jaccard of the groups' distinct
    shingle sets — the verification path (quadratic in shared grams, the
    cost the sketch avoids).  Pairs with an empty union get NULL
    (undefined, not 0).

    Intersections come from per-gram bucket expansion, NOT a gram
    self-join (r14, the minhash/ngram pair-generation rewrite applied to
    the overlap path): the old self-join evaluated the distinct-shingle
    subtree once per side plus once for the cardinalities — three
    full-corpus tokenizations and two gram-keyed join-side shuffles
    (2 × 5.3 MB at sf0.1, twin 450/800 ms map stages in the gate
    attribution).  Grouping each gram's sorted group set and exploding
    the strict upper triangle yields one bucket row per gram (bounded by
    |groups|), each contributing exactly 1 to every pair that shares the
    gram — count(triangle rows) per (a, b) IS the intersection
    cardinality.  `collect_set` dedups, so the separate `distinct()`
    shuffle disappears too; cardinalities re-derive from the buckets
    (explode is the aggregation's inverse — same (group, gram) set)."""
    buckets = (_exploded_grams(df, group_col, text_col, n)
               .groupBy("gram")
               .agg(F.array_sort(F.collect_set(F.col(group_col)))
                    .alias("gs")))
    card = (buckets.select(F.explode("gs").alias("g"))
            .groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("c")))
    # two-level expansion (r15): bucket size is bounded by |groups| here,
    # but the shape is shared with the unbounded dedup paths — stream the
    # triangle with O(|bucket|) per-row memory instead of materializing
    # the O(|bucket|²) pair array in one row buffer (r14 verdict #1)
    inter = (upper_triangle_pairs(buckets.filter(F.size("gs") > 1),
                                  "gs", "a", "b")
             .groupBy("a", "b")
             .agg(F.count(F.lit(1)).cast("long").alias("i")))
    pairs = (F.broadcast(card.select(F.col("g").alias("a"),
                                     F.col("c").alias("ca")))
             .crossJoin(card.select(F.col("g").alias("b"),
                                    F.col("c").alias("cb")))
             .filter(F.col("a") < F.col("b")))
    return (pairs.join(inter, on=["a", "b"], how="left")
            .withColumn("i", F.coalesce(F.col("i"), F.lit(0)))
            .select("a", "b", F.expr(
                "CASE WHEN ca + cb - i > 0 "
                "THEN round(CAST(i AS DOUBLE) / (ca + cb - i), 6) END")
                .alias("jaccard")))


def group_overlap_matrix(df: DataFrame, group_col: str = "source",
                         text_col: str = "text", n_hashes: int = 16,
                         n: int = 3, exact: bool = False) -> DataFrame:
    """(a, b, est_jaccard[, jaccard]) — the overlap report.  `exact=True`
    adds the exact column next to the estimate (small-scale verification /
    estimator-error reporting; at 100 TB run the sketch alone)."""
    sigs = group_minhash_signatures(df, group_col, text_col, n_hashes, n)
    est = sketch_overlap_pairs(sigs, group_col, n_hashes)
    if not exact:
        return est.orderBy("a", "b")
    return (est.join(group_shingle_jaccard(df, group_col, text_col, n),
                     on=["a", "b"], how="left")
            .orderBy("a", "b"))
