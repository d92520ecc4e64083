"""Sampling strategies for the subset operator.

Reference: `SubsetStrategy::RandomPercent`
(/root/reference/subset/src/lib.rs:40-56; subset/src/postgres.rs:305-331) —
systematic modulo selection over the INSERT-statement order: deterministic
given row order, not truly random.

Two strategies here:

- :func:`hash_percent_filter` — the 100 TB path.  Keep rows where a
  deterministic md5-derived value of the key is < pct.  Embarrassingly
  parallel (no global ordering, no shuffle), stable across partitioning,
  retries and engines, and exactly reproducible in the DuckDB oracle via the
  shared dialect builder.
- :func:`systematic_percent` — reference-faithful every-k-th-row selection.
  Needs a global row_number (single-partition sort bottleneck), so it is the
  small-data/compat path only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import dialect as D


def hash_percent_sql(d: str, key_expr: str, pct: int, salt: str = "subset") -> str:
    """Cross-dialect predicate: deterministic pseudo-random pct% of rows.

    Uses the UNIFORM hash (hex→int, not digit-translate), so the observed
    keep-rate converges to pct (the translate trick under-kept pct=20 by
    ~1.8pp: digits 1-6 twice as likely as 0,7,8,9)."""
    return f"{D.hash_uniform_mod(d, key_expr, salt, 100)} < {pct}"


def hash_percent_filter(df: DataFrame, key: str, pct: int, salt: str = "subset") -> DataFrame:
    return df.filter(F.expr(hash_percent_sql(D.SPARK, key, pct, salt)))


def systematic_percent(df: DataFrame, order_key: str, pct: int) -> DataFrame:
    """Every k-th row by `order_key` (k = 100 // pct), like the reference's
    modulo selection over statement order (subset/postgres.rs:316-328).

    Global row_number ⇒ one-partition sort: fine at fixture scale, do not use
    at 100 TB — that is what hash_percent_filter is for.
    """
    k = max(1, 100 // pct)
    w = Window.orderBy(order_key)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") % k == 0)
        .drop("__rn")
    )
