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
