"""Skew mitigation — salting for hot join/aggregation keys.

AQE's skew-join split (enabled in session.py) handles sort-merge joins at
runtime; salting is the MANUAL fallback for the cases AQE can't fix: a
shuffle-hash/broadcast-incapable join with a few dominant keys, or a
distinct-style aggregation whose per-key state is itself huge.  Both
operators here are pure DataFrame compositions (no UDF, no repartition
hints), so Catalyst still optimizes around them.

No reference analogue (single-node engine, SURVEY.md §2.9) — this is part
of the 100 TB operating kit alongside dedup/similarity.

How the math works:

- `salted_join`: left side gets a deterministic salt in [0, factor) from a
  hash of its whole row id-space; the (smaller) right side is replicated
  `factor` times, once per salt value.  The equi-join key becomes
  (key, salt), so one hot key spreads over `factor` shuffle partitions.
  Replication cost: |right| × factor rows — pick factor ≈ a few × executor
  count, and keep the replicated side the small one.
- `salted_count_distinct`: phase 1 aggregates (key, salt) partials —
  the hot key's value-set splits across `factor` states; phase 2 merges the
  per-salt partials.  Exact, associative, two shuffles of shrinking size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt_col(cols: list[str], factor: int):
    """Deterministic salt in [0, factor): Murmur3 hash of the row's natural
    columns (NOT rand() — task retries must recompute the same salt).  The
    salt never reaches the output, so cross-engine reproducibility doesn't
    matter and the cheapest JVM hash wins: md5+conv here cost ~5 s across a
    5M-row bench input, F.hash is near-free."""
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(factor))


def salted_join(left: DataFrame, right: DataFrame, on: str,
                factor: int = 8, how: str = "inner",
                salt_by: list[str] | None = None) -> DataFrame:
    """Equi-join where `left` may have hot keys: spread each left key over
    `factor` salt buckets and replicate `right` once per bucket.

    `salt_by` defaults to all left columns (maximum spread).  Output columns
    = the plain `left.join(right, on, how)` — the salt never escapes.

    Only left-preserving joins are valid: an unmatched RIGHT row exists once
    per replica, so right/full outer would duplicate it `factor` times.
    """
    if how not in ("inner", "left", "left_outer", "leftsemi", "left_semi",
                   "left_anti", "leftanti"):
        raise ValueError(f"salted_join supports left-preserving joins, not {how}")
    salt_by = salt_by or left.columns
    lb = left.withColumn("__salt", _salt_col(salt_by, factor))
    rb = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(factor)])))
    out = lb.join(rb, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def salted_count_distinct(df: DataFrame, key: str, value: str,
                          factor: int = 8) -> DataFrame:
    """Exact per-key distinct-count where one key may dominate: the value
    space of each key splits across `factor` partial states, then partials
    merge.  (A plain groupBy(key).agg(countDistinct) funnels the hot key's
    whole value set through ONE task.)"""
    salted = df.withColumn("__salt", _salt_col([value], factor))
    partial = (salted.groupBy(key, "__salt")
               .agg(F.count_distinct(F.col(value)).alias("__pc")))
    return (partial.groupBy(key)
            .agg(F.sum("__pc").alias("n_distinct")))
