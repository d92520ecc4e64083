"""Per-group admission quotas for a document stream.

The streaming rendering of :func:`~..operators.sample.per_group_cap`:
an ingest stream (crawl batches arriving over time) must admit at most
`cap` documents per group (domain/source/language) ACROSS THE STREAM'S
LIFETIME — the batch operator re-ranks a finished corpus, this one
enforces the budget as data arrives, first-come-first-admitted.

State per group is one integer (admitted so far): O(1) per key,
partitioned by the group key across executors like any shuffle.  Within
a micro-batch the group's rows are sorted by the id column before the
remaining budget is applied, so a single-batch run is deterministic and
replays byte-identically from a checkpoint; across batches admission is
arrival-ordered by construction.  The per-group ADMITTED COUNT —
min(cap, group size) once the stream drains — is independent of how the
source chopped the data into batches, which is what the DuckDB oracle
checks.

Production shape: the quota stream runs in front of the incremental
dedup index (operators/ingest.py) so a runaway domain can't flood the
admit tier no matter how many batches it spans.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

STATE_SCHEMA = StructType([
    StructField("admitted", LongType()),
    StructField("seen", LongType()),
])


def _make_update(cap: int, id_field: str):
    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (group,) = key
        admitted, seen = state.get if state.exists else (0, 0)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(id_field)  # in-batch determinism
            seen += len(pdf)
            budget = cap - admitted
            if budget > 0:
                take = pdf.head(budget)
                admitted += len(take)
                out.append(take)
        state.update((admitted, seen))
        if out:
            yield pd.concat(out)

    return update


def streaming_group_quota(docs: DataFrame, cap: int,
                          group_col: str = "lang",
                          id_col: str = "doc_id") -> DataFrame:
    """Admit at most `cap` rows per group over the stream's lifetime,
    emitting the admitted (group, id) rows as they arrive."""
    if cap < 0:
        raise ValueError(f"cap must be >= 0, got {cap}")
    out_schema = StructType([
        StructField(group_col, StringType()),
        StructField(id_col, LongType()),
    ])
    return (docs.select(group_col, id_col)
            .groupBy(group_col)
            .applyInPandasWithState(
                _make_update(cap, id_col),
                outputStructType=out_schema,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
