"""Introspection commands (reference I1-I4, SURVEY.md §2.8):

- `source schema`   → per-table schema listing (commands/source.rs:10-56)
- `transformer list` → transformer registry table (commands/transformer.rs:61-70)
- `dump list`       → manifest rendered as a DataFrame (commands/dump.rs:37-65)
- probabilistic schema for semi-structured text columns (I2 — the reference
  shells out to mongodb-schema-parser; Spark's own JSON inference is the
  native equivalent)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_tables
from .functions.transformers import TRANSFORMERS
from .sinks.datastore import Datastore

_DESCRIPTIONS = {
    "email": "replace a string with a deterministic fake email",
    "first-name": "replace a string with a deterministic fake first name",
    "phone-number": "replace a string with a fake US phone number",
    "credit-card": "replace a string with a Luhn-valid fake card number",
    "random": "random alphanumeric string of identical char length",
    "random-integer": "deterministic pseudo-random bigint",
    "random-float": "deterministic pseudo-random double",
    "keep-first-char": "keep only the first character",
    "keep-first-char-number": "keep only the leading digit (sign preserved)",
    "redacted": "first 3 chars + mask (configurable char/width)",
    "transient": "identity / no-op",
    "random-date": "deterministic pseudo-random date (1970-2020)",
    "custom-wasm": "run a user WebAssembly module per value (WASI stdio)",
}

# transformers with no SQL form (dispatched in apply_transformers, not
# expression builders) — listed alongside TRANSFORMERS in the registry,
# mirroring the reference's registry which includes custom-wasm
# (transformer/mod.rs:25-37)
NON_SQL_TRANSFORMERS = ("custom-wasm",)


def source_schema(spark: SparkSession, sf_dir: str,
                  tables: list[str] | None = None) -> DataFrame:
    """(table_name, column_name, ordinal, data_type) for every source table."""
    rows = []
    for t, df in load_tables(spark, sf_dir, tables).items():
        for i, f in enumerate(df.schema.fields):
            rows.append((t, f.name, i, f.dataType.simpleString()))
    return spark.createDataFrame(
        rows, "table_name string, column_name string, ordinal int, data_type string")


def transformer_list(spark: SparkSession) -> DataFrame:
    names = sorted(set(TRANSFORMERS) | set(NON_SQL_TRANSFORMERS))
    rows = [(name, _DESCRIPTIONS.get(name, "")) for name in names]
    return spark.createDataFrame(rows, "id string, description string")


def dump_list(spark: SparkSession, datastore_root: str) -> DataFrame:
    """Manifest as a DataFrame (name, size, created_at, compressed,
    encrypted, n_tables)."""
    store = Datastore(spark, datastore_root)
    rows = [(d.directory_name, d.size, float(d.created_at), d.compressed,
             d.encrypted, len(d.tables)) for d in store.list_dumps()]
    return spark.createDataFrame(
        rows, "name string, size long, created_at double, compressed boolean, "
              "encrypted boolean, n_tables int")


def infer_json_schema(spark: SparkSession, df: DataFrame, column: str,
                      max_values: int = 10_000) -> str:
    """Probabilistic schema of a JSON string column (reference I2:
    mongodb-schema-parser over sampled documents, source/mongodb.rs:302-329).
    Spark-native: JSON inference over AT MOST `max_values` non-null values
    — introspection must stay a bounded probe, not a full-table scan +
    full inference pass (at 100 TB an unlimited version is an unbounded
    job for a schema *hint*)."""
    sample = (df.select(F.col(column)).filter(F.col(column).isNotNull())
              .limit(max_values))
    inferred = spark.read.json(sample.rdd.map(lambda r: r[0]))
    return inferred.schema.json()


# --- distributed ANALYZE (SS2 upgraded from "obsolete by design") -----------

_NUMERIC_TYPES = ("tinyint", "smallint", "int", "bigint", "float", "double")


def table_stats(df: DataFrame, table_name: str,
                approx: bool = False) -> DataFrame:
    """Distributed ANALYZE: one aggregation pass over the table yields a
    long-format column-statistics profile — (column, type, row count,
    null count, distinct count, typed min/max).

    The reference's subset planner runs a per-table stats pass before
    choosing what to walk (SURVEY §2 SS2, subset/src/postgres.rs); parquet
    row-group stats made a row-count pass redundant here, but PLANNING
    stats (ndv for join-order/broadcast decisions, null density for
    anti-join rewrites, min/max for partition pruning sanity) still need a
    scan, and this is that scan: every statistic for every column rides
    ONE map-side-partial aggregation — no per-column jobs.

    `approx=False` uses exact count(DISTINCT) — Catalyst plans multiple
    distincts via Expand (rows × profiled columns), acceptable while the
    table fits a fixture and REQUIRED for the DuckDB oracle.
    `approx=True` is the 100 TB path: HLL++ approx_count_distinct in a
    single Expand-free pass (asserted within tolerance of exact in the
    unit tests, the corpus_quality_report convention).

    Timestamps profile as epoch micros in the numeric min/max (formatting
    a timestamp is engine-specific; an integer is not)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    per_col: list[tuple[str, str]] = []  # (name, simple type)
    for f in df.schema.fields:
        c, t = f.name, f.dataType.simpleString()
        per_col.append((c, t))
        aggs.append(F.count(F.col(c)).cast("long").alias(f"__nn_{c}"))
        ndv = (F.approx_count_distinct(F.col(c)) if approx
               else F.countDistinct(F.col(c)))
        aggs.append(ndv.cast("long").alias(f"__ndv_{c}"))
        if t in _NUMERIC_TYPES:
            num = F.col(c).cast("double")
        elif t.startswith("timestamp"):
            # NTZ → TIMESTAMP is value-preserving under the UTC session TZ
            # (catalog.load_table pins it); unix_micros rejects NTZ input
            num = F.unix_micros(F.col(c).cast("timestamp")).cast("double")
        else:
            num = F.lit(None).cast("double")
        aggs.append(F.round(F.min(num), 6).alias(f"__min_num_{c}"))
        aggs.append(F.round(F.max(num), 6).alias(f"__max_num_{c}"))
        s = F.col(c) if t == "string" else F.lit(None).cast("string")
        aggs.append(F.min(s).alias(f"__min_str_{c}"))
        aggs.append(F.max(s).alias(f"__max_str_{c}"))
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.lit(t).alias("data_type"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).cast("long").alias("n_null"),
            F.col(f"__ndv_{c}").alias("ndv"),
            F.col(f"__min_num_{c}").alias("min_num"),
            F.col(f"__max_num_{c}").alias("max_num"),
            F.col(f"__min_str_{c}").alias("min_str"),
            F.col(f"__max_str_{c}").alias("max_str"),
        ) for c, t in per_col]
    return (one.select(F.explode(F.array(*structs)).alias("s"))
            .select(F.lit(table_name).alias("table_name"), "s.*"))


def table_stats_oracle_sql(table: str, columns: list[tuple[str, str]]) -> str:
    """DuckDB rendering of :func:`table_stats` (exact mode) for `columns`
    as (name, spark simple type) pairs — one UNION ALL branch per column,
    same long format, same rounding."""
    branches = []
    for c, t in columns:
        if t in _NUMERIC_TYPES:
            mn, mx = (f"round(min(CAST({c} AS DOUBLE)), 6)",
                      f"round(max(CAST({c} AS DOUBLE)), 6)")
        elif t.startswith("timestamp"):
            mn, mx = (f"round(CAST(epoch_us(min({c})) AS DOUBLE), 6)",
                      f"round(CAST(epoch_us(max({c})) AS DOUBLE), 6)")
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
        if t == "string":
            smn, smx = f"min({c})", f"max({c})"
        else:
            smn = smx = "CAST(NULL AS VARCHAR)"
        branches.append(f"""
SELECT '{table}' AS table_name, '{c}' AS column_name, '{t}' AS data_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS ndv,
       {mn} AS min_num, {mx} AS max_num,
       {smn} AS min_str, {smx} AS max_str
FROM {table}""")
    return " UNION ALL ".join(branches)
