"""Workload registry: every implemented operator exposed as a named query.

Each :class:`Query` couples an idiomatic Spark DataFrame plan with the
equivalent DuckDB oracle SQL.  The driver runs both at sf0.01 and compares
row-count + schema + order-insensitive value hash (see /root/repo/README /
__spark_entry__.py contract).  Queries whose semantics are not SQL-expressible
(streaming state, iterative algorithms) carry ``oracle=None`` and get a
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def register(q: Query) -> Query:
    assert q.name not in REGISTRY, f"duplicate query {q.name}"
    REGISTRY[q.name] = q
    return q


def _load_all() -> None:
    # one module per operator family; extend as operators land
    from . import (  # noqa: F401
        analytics,
        dedup_queries,
        introspect_queries,
        multimodal_queries,
        pipeline,
        similarity_queries,
        skew_queries,
        streaming_queries,
        subset_queries,
        text_queries,
    )


_load_all()
