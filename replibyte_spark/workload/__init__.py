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
    # A str is used as-is; a zero-arg callable is resolved (and cached) the
    # first time the oracle is actually needed — gate/test time, never
    # module import.  Oracles that must inspect the fixtures (e.g.
    # table_stats_profile DESCRIBEs the parquet footer for its column
    # list) register the builder itself, so importing the workload package
    # stays fixture-free and duckdb-free (r12, ADVICE: the eager build
    # crashed any CLI import on a machine without /root/testdata).
    oracle: "str | Callable[[], str] | None" = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set

    def oracle_text(self) -> "str | None":
        if callable(self.oracle):
            self.oracle = self.oracle()
        return self.oracle


# The driver's correctness artifact records only the FIRST 50 entries of
# __spark_entry__.queries().  REGISTRY therefore holds at most 50 gate
# queries (one per operator family / risk surface — enforced by
# tests/test_misc_coverage.py) and the highest-risk modules register first
# so nothing load-bearing can ever fall past the cap.  EXTRA holds
# subsumed/redundant variants: still oracle-checked by pytest
# (tests/test_oracle_parity.py) and usable by bench.py, but invisible to
# the driver.
REGISTRY: dict[str, Query] = {}
EXTRA: dict[str, Query] = {}


def register(q: Query, *, extra: bool = False) -> Query:
    assert q.name not in REGISTRY and q.name not in EXTRA, \
        f"duplicate query {q.name}"
    (EXTRA if extra else REGISTRY)[q.name] = q
    return q


def all_queries() -> dict[str, Query]:
    """Driver-gated + pytest-only queries (for tests and bench)."""
    return {**REGISTRY, **EXTRA}


# On-disk fixture builders (materialized ANN indexes, mongodump archives —
# anything keyed by dataset fingerprint + parameters and built lazily on
# first use).  bench.py runs these BEFORE its timing loop: a parameter
# change (new cache key) must cost one build OUTSIDE the measured
# iterations, not land inside a recorded time (the BENCH_r06 artifact
# inflation).  Each preparer takes (spark, sf_dir) and must be idempotent.
FIXTURE_PREPARERS: list[Callable[[SparkSession, str], None]] = []


def register_fixture_preparer(
        fn: Callable[[SparkSession, str], None]) -> Callable:
    FIXTURE_PREPARERS.append(fn)
    return fn


def prepare_fixtures(spark: SparkSession, sf_dir: str) -> None:
    """Idempotently build every parameter-keyed on-disk fixture."""
    for fn in FIXTURE_PREPARERS:
        fn(spark, sf_dir)


def _load_all() -> None:
    # one module per operator family; ORDER MATTERS: highest-risk gate
    # queries (subset closure, text/sampling — the round-1 failures) first.
    from . import (  # noqa: F401
        subset_queries,
        text_queries,
        dedup_queries,
        similarity_queries,
        clustering_queries,
        skew_queries,
        analytics,
        pipeline,
        multimodal_queries,
        streaming_queries,
        introspect_queries,
        corpus,
        pii_queries,
        classifier_queries,
        retrieval_queries,
    )


_load_all()
