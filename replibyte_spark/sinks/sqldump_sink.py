"""SQL-text sink: re-encode DataFrames as INSERT statements.

Reference: `to_query` row re-encoder
(/root/reference/replibyte/src/source/postgres.rs:499-546 — rebuilds
`INSERT INTO db.table (cols) VALUES (vals);` escaping `'` → `''`,
`None` → NULL).  Here the encoding is one Catalyst projection
(concat/when expressions — no per-row Python), so a 100 TB table renders as
fast as it scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, NumericType


def _value_expr(field) -> F.Column:
    c = F.col(f"`{field.name}`")
    if isinstance(field.dataType, BooleanType):
        rendered = F.when(c, F.lit("TRUE")).otherwise(F.lit("FALSE"))
    elif isinstance(field.dataType, NumericType):
        rendered = c.cast("string")
    else:
        escaped = F.regexp_replace(c.cast("string"), "'", "''")
        rendered = F.concat(F.lit("'"), escaped, F.lit("'"))
    return F.coalesce(rendered, F.lit("NULL"))


def to_insert_statements(df: DataFrame, table: str) -> DataFrame:
    """DataFrame[stmt: string] — one INSERT statement per row."""
    cols = ", ".join(f.name for f in df.schema.fields)
    values = []
    for i, f in enumerate(df.schema.fields):
        if i:
            values.append(F.lit(", "))
        values.append(_value_expr(f))
    stmt = F.concat(
        F.lit(f"INSERT INTO {table} ({cols}) VALUES ("), *values, F.lit(");")
    )
    return df.select(stmt.alias("stmt"))


def write_sql_dump(df: DataFrame, table: str, path: str,
                   single_file: bool = False) -> None:
    """Write the INSERT stream as text chunk files (the reference's
    `{N}.dump` chunks, tasks/full_dump.rs:72-113 — here Spark part-files)."""
    stmts = to_insert_statements(df, table)
    if single_file:
        stmts = stmts.coalesce(1)
    stmts.write.mode("overwrite").text(path)
