"""Banded range join — match left rows to right rows in a trailing time
window, without the cross-product blowup a naive inequality join produces.

Spark turns `l.ts BETWEEN r.ts AND r.ts + W` with an equality key into a
join-then-filter, but with NO equality key (or a hot key) the naive plan
degenerates to per-key cross products.  The standard scale fix is banding:

  1. band(ts) = floor(unix(ts) / W)
  2. replicate each RIGHT row into bands {b, b+1} — any left row's trailing
     window [lts-W, lts] only spans bands {band(lts)-1, band(lts)}, so every
     candidate pair co-locates on (key, band) and each true pair matches via
     exactly ONE replica (left's band is fixed).
  3. equi-join on (key, band), then apply the exact range predicate.

Join fan-out is bounded by rows-per-band, not rows-per-key; the shuffle key
(key, band) also spreads hot keys across time.  DuckDB's inequality join is
the oracle — an independent implementation of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trailing_window_count(left: DataFrame, right: DataFrame, on: str,
                          left_ts: str = "ts", right_ts: str = "ts",
                          window_seconds: float = 3600,
                          count_alias: str = "n_in_window") -> DataFrame:
    """Per left row: count of right rows with
    `left_ts - window <= right_ts <= left_ts` on the same key (0 when none).

    `window_seconds` may be fractional; the range predicate compares exact
    integer microseconds (the earlier `int(window_seconds)` silently
    truncated 0.5 → 0, and a zero-width band made floor(ts/0) NULL —
    every count came back 0).
    """
    w_us = int(window_seconds * 1_000_000)
    if w_us <= 0:
        raise ValueError(f"window_seconds must be > 0, got {window_seconds}")
    # Unique per-row tag so duplicate left rows each produce their own output
    # row (grouping by the data columns alone would collapse them).
    # cast("timestamp") admits TIMESTAMP_NTZ; under the session's pinned
    # UTC timezone it is the identity epoch mapping
    def us(c):
        return F.unix_micros(c.cast("timestamp"))

    lb = (left.withColumn("__lid", F.monotonically_increasing_id())
          .withColumn("__band", F.floor(us(F.col(left_ts)) / w_us)))
    rb = (right.select(
            F.col(on).alias("__rk"),
            F.col(right_ts).alias("__rts"))
          .withColumn("__b0", F.floor(us(F.col("__rts")) / w_us))
          .withColumn("__band", F.explode(F.array(F.col("__b0"), F.col("__b0") + 1)))
          .drop("__b0"))
    cond = (
        (lb[on] == rb["__rk"]) & (lb["__band"] == rb["__band"])
        & (rb["__rts"] <= lb[left_ts])
        & (us(rb["__rts"]) >= us(lb[left_ts]) - w_us)
    )
    joined = lb.join(rb, cond, how="left")
    return (joined.groupBy(lb["__lid"], *[lb[c] for c in left.columns])
            .agg(F.count(rb["__rts"]).alias(count_alias))
            .drop("__lid"))
