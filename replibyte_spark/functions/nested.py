"""Nested-field transformer addressing: dotted paths + `$[]` array wildcard.

Reference: the MongoDB source applies transformers recursively through
Document/Array values addressed as e.g. `contacts.$[].email`
(/root/reference/replibyte/src/source/mongodb.rs:127-254; docs
"Nested fields").  Spark-first restatement: the path compiles to one nested
expression of `transform()` (array wildcard) and struct rebuilds — a single
projection, no row-at-a-time recursion.

The compiler emits SQL text in both dialects (Spark `named_struct` /
`transform`, DuckDB `struct_pack` / `list_transform`), so nested transforms
are oracle-checkable like every scalar one.  The Spark side can derive the
struct spec from a DataFrame schema; the oracle side passes the same spec
explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

from .. import dialect as D
from .transformers import DEFAULT_SALT, transformer_sql

WILDCARD = "$[]"


def parse_path(path: str) -> list[str]:
    """'contacts.$[].email' → ['contacts', '$[]', 'email']"""
    segs = [s for s in path.split(".") if s]
    if not segs:
        raise ValueError(f"empty transformer path: {path!r}")
    return segs


# spec: ("struct", [(name, spec), ...]) | ("array", elem_spec) | ("leaf",)

def spec_from_datatype(dt) -> tuple:
    if isinstance(dt, StructType):
        return ("struct", [(f.name, spec_from_datatype(f.dataType)) for f in dt.fields])
    if isinstance(dt, ArrayType):
        return ("array", spec_from_datatype(dt.elementType))
    return ("leaf",)


def nested_transform_sql(d: str, base: str, spec: tuple, segs: list[str],
                         transformer: str, salt: str = DEFAULT_SALT,
                         _depth: int = 0) -> str:
    """SQL expression equal to `base` with the value(s) at `segs` transformed."""
    if not segs:
        if spec[0] != "leaf":
            raise ValueError(f"path ends at non-scalar value (spec {spec[0]})")
        return transformer_sql(transformer, d, base, salt)
    head, rest = segs[0], segs[1:]
    if head == WILDCARD:
        if spec[0] != "array":
            raise ValueError(f"'$[]' applied to non-array (spec {spec[0]})")
        var = f"_x{_depth}"
        inner = nested_transform_sql(d, var, spec[1], rest, transformer, salt,
                                     _depth + 1)
        fn = "transform" if d == D.SPARK else "list_transform"
        return f"{fn}({base}, {var} -> {inner})"
    if spec[0] != "struct":
        raise ValueError(f"field {head!r} addressed on non-struct (spec {spec[0]})")
    fields = dict(spec[1])
    if head not in fields:
        raise KeyError(f"no field {head!r}; have {sorted(fields)}")
    parts = []
    for name, sub in spec[1]:
        child = f"{base}.{_quote_ident(d, name)}"
        expr = (nested_transform_sql(d, child, sub, rest, transformer, salt, _depth)
                if name == head else child)
        if d == D.SPARK:
            parts.append(f"'{name}', {expr}")
        else:
            parts.append(f"{name} := {expr}")
    ctor = "named_struct" if d == D.SPARK else "struct_pack"
    return f"{ctor}({', '.join(parts)})"


def _quote_ident(d: str, name: str) -> str:
    return f"`{name}`" if d == D.SPARK else f'"{name}"'


def transform_nested(df: DataFrame, path: str, transformer: str,
                     salt: str = DEFAULT_SALT) -> DataFrame:
    """Apply `transformer` at `path` (e.g. 'contacts.$[].email'); all other
    data untouched.  One projection — Catalyst prunes and fuses it."""
    segs = parse_path(path)
    root = segs[0]
    if root == WILDCARD:
        raise ValueError("path must start at a column name")
    schema = {f.name: f.dataType for f in df.schema.fields}
    if root not in schema:
        raise KeyError(f"no column {root!r}; have {sorted(schema)}")
    spec = spec_from_datatype(schema[root])
    sql = nested_transform_sql(D.SPARK, f"`{root}`", spec, segs[1:], transformer, salt)
    return df.withColumn(root, F.expr(sql))
