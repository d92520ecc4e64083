"""As-of join — for each left row, the most recent right row at or before
its timestamp, per key.  Spark has no built-in as-of join (pandas-on-Spark
`merge_asof` exists but detours through pandas semantics); DuckDB has a
native `ASOF JOIN`, which makes the oracle an independent implementation of
the same semantics rather than the same SQL — a stronger check than textual
parity.

Implementation: the union-window plan.
  1. Tag left (side=1) and right (side=0) rows, union on (key, ts, side,
     payload...).
  2. One window per key ordered by (ts, side, tiebreak):
     `last(right_payload, ignorenulls=True)` over unbounded-preceding rows
     carries the latest right value forward; side=0 sorts before side=1 at
     equal ts, so `right.ts <= left.ts` is inclusive.
  3. Keep left rows.

Cost: ONE shuffle on the key (same as any join) + a per-partition sort — no
range explosion, no per-row probing.  Skewed keys behave like any skewed
window (AQE/salting apply).  This is the standard scale shape for as-of
enrichment (trades the O(n·m) range join for a sort-merge sweep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_payload: list[str] | None = None,
              tolerance_seconds: float | None = None,
              suffix: str = "_matched") -> DataFrame:
    """Left as-of join: every left row + the latest right row with
    `right_ts <= left_ts` on the same `on` key (NULLs when none).

    `tolerance_seconds` optionally discards matches older than the window
    (pandas merge_asof semantics).
    """
    right_payload = right_payload or [c for c in right.columns
                                      if c not in (on, right_ts)]
    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs = (right.select(
        F.col(on),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_payload])
        .withColumn("__side", F.lit(0))
        .withColumn("__ts", F.col("__rts")))
    payload_cols = [f"{c}{suffix}" for c in right_payload]
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None))
    for c in ["__rts", *payload_cols]:
        if c not in lhs.columns:
            lhs = lhs.withColumn(c, F.lit(None))
    combined = lhs.select(rhs.columns).unionByName(rhs)
    w = (Window.partitionBy(on)
         .orderBy(F.col("__ts"), F.col("__side"))
         .rowsBetween(Window.unboundedPreceding, 0))
    # Carry ONE struct per right row (never per-column): a right row with a
    # NULL payload value must still win as the latest match, with its own
    # NULL — forward-filling columns independently would pair the newest
    # timestamp with an older row's payload (torn match).
    carry_src = F.when(
        F.col("__side") == 0,
        F.struct(F.col("__rts").alias("__rts"),
                 *[F.col(c).alias(c) for c in payload_cols]))
    carried = F.last(carry_src, ignorenulls=True).over(w).alias("__carry")
    keep = [c for c in left.columns]
    out = (combined
           .select(*keep, F.col("__side"), F.col("__ts"), carried)
           .filter(F.col("__side") == 1)
           .select(*keep,
                   F.col("__carry.__rts").alias("__rts"),
                   *[F.col(f"__carry.{c}").alias(c) for c in payload_cols]))
    # NULL join keys never match (standard join / DuckDB ASOF semantics):
    # the window partitions NULL keys together, so without this mask a
    # NULL-keyed left row would pick up a NULL-keyed right row's payload
    valid = F.col(on).isNotNull()
    if tolerance_seconds is not None:
        # exact integer-microsecond comparison — unix_timestamp() truncates
        # to whole seconds, mis-deciding sub-second tolerances (and
        # sub-second timestamp differences) in both directions.  The
        # cast("timestamp") admits TIMESTAMP_NTZ columns; under the
        # session's pinned UTC timezone (session.get_spark) it is the
        # identity epoch mapping, and the DIFFERENCE is offset-free anyway.
        valid = valid & (
            (F.unix_micros(F.col(left_ts).cast("timestamp"))
             - F.unix_micros(F.col("__rts").cast("timestamp")))
            <= int(tolerance_seconds * 1_000_000))
    for c in payload_cols:
        out = out.withColumn(c, F.when(valid, F.col(c)))
    out = out.withColumn("__rts", F.when(valid, F.col("__rts")))
    return out.withColumnRenamed("__rts", f"{right_ts}{suffix}")
