"""Custom stateful streaming operator via `applyInPandasWithState`.

The reference has no streaming at all (SURVEY.md §2.9); this is the
north-star surface for custom stateful ops the built-in windowed aggregations
can't express: arbitrary per-key state evolved batch-by-batch with
Arrow-transferred group data.

Example operator: running per-user totals — every micro-batch emits the
user's cumulative (n_events, sum_value) so downstream consumers see a
monotone snapshot stream.  State is (count, sum) per user: O(1) per key,
partitioned by the grouping key across executors exactly like a shuffle.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])
OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])


def _update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                       "sum_value": [round(total, 2)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful running totals per user (streaming DataFrame in, append-mode
    emission of the current cumulative totals each micro-batch)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
