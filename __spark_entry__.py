"""Driver contract for the spark-graft builder (PySpark target).

Thin shell over :mod:`replibyte_spark.workload` — the package owns every
query; this file only adapts the registry to the driver's API:

- ``entry(spark)`` — flagship query on sf0.001 (smoke check)
- ``queries()`` — {name: fn(spark, sf_dir) -> DataFrame} per implemented
  operator from SURVEY.md §2
- ``oracle_sql()`` — matching DuckDB SQL per query (omitted only for
  non-SQL-expressible operators → driver does a rows-only check)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from replibyte_spark.workload import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q1_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    out = {}
    for name, q in REGISTRY.items():
        sql = q.oracle_text()
        if sql is not None:
            out[name] = sql
    return out
