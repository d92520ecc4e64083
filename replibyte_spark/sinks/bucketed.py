"""Bucketed table layout: pre-shuffled storage for co-located joins.

THE classic 100 TB lever this repo's other layouts (ANN index, minhash
index, DSIR model) don't cover: a fact table that is repeatedly joined or
aggregated on the same key should be written bucketed on that key, so the
shuffle happens ONCE at write time and every subsequent join/aggregation
on the key runs exchange-free.  On a 1000-executor cluster the repeated
join's Exchange of the 100 TB fact side is the job — bucketing amortizes
it across every downstream query.

Spark-first rendering: ``DataFrameWriter.bucketBy(n, key).sortBy(key)``
with an explicit ``path`` (external table — data sits in the datastore,
the catalog entry is metadata), read back via ``spark.table``.  Catalyst
then plans SortMergeJoin with NO Exchange and NO per-query Sort on either
bucketed side (both sides bucketed INTO THE SAME bucket count on the join
key; tests/test_plan_shapes.py locks the exchange-free plan).

The session catalog is in-memory in this deployment, so a fresh session
re-registers the SAME files with ``register_bucketed_table`` (CREATE
TABLE ... USING PARQUET CLUSTERED BY ... LOCATION): bucket file names
carry their bucket id, so a re-registered table keeps its exchange-free
read path — the layout, like every layout here, is the durable artifact
and the catalog entry is cheap metadata.  The spec (bucket column +
count) is written to a ``_bucket_spec.json`` sidecar at write time and
VALIDATED on re-attach: Spark trusts the DDL blindly, so registering
existing files under a different spec (a changed constant, a renamed
key) would silently produce wrong exchange-free join results (r12
ADVICE) — the sidecar turns that into a loud error.

Reference analogue: Replibyte has no storage-layout planning at all (its
datastore is an opaque blob archive, datastore/s3.rs); this module exists
because a Spark-first engine can make the dump itself join-optimal.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from ..util import hadoop_exists, hadoop_read_bytes, hadoop_write_bytes

SPEC_FILE = "_bucket_spec.json"


def _ddl_columns(df: DataFrame) -> str:
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                     for f in df.schema.fields)


def _write_spec(spark: SparkSession, path: str, bucket_col: str,
                n_buckets: int, sort: bool) -> None:
    # Hadoop FS, never the local file API: the spec must ride the same
    # scheme as the bucket files it describes (r13 — the
    # partitioned-layout lesson)
    hadoop_write_bytes(
        spark, f"{path}/{SPEC_FILE}",
        json.dumps({"bucket_col": bucket_col, "n_buckets": n_buckets,
                    "sort": sort, "version": 1}).encode())


def read_bucket_spec(spark: SparkSession, path: str) -> "dict | None":
    """The spec the layout at `path` was written with, or None for a
    pre-spec layout (written before r12)."""
    p = f"{path}/{SPEC_FILE}"
    if not hadoop_exists(spark, p):
        return None
    return json.loads(hadoop_read_bytes(spark, p).decode())


def _check_spec(spark: SparkSession, path: str, bucket_col: str,
                n_buckets: int, sort: "bool | None" = None) -> None:
    spec = read_bucket_spec(spark, path)
    if spec is None:
        return  # pre-spec layout: caller carries the contract (documented)
    if (spec["bucket_col"] != bucket_col
            or int(spec["n_buckets"]) != int(n_buckets)):
        raise ValueError(
            f"bucketed layout at {path} was written CLUSTERED BY "
            f"({spec['bucket_col']}) INTO {spec['n_buckets']} BUCKETS but "
            f"is being registered as ({bucket_col}) INTO {n_buckets}; "
            f"Spark would trust the wrong DDL and return incorrect "
            f"exchange-free join results — rewrite the layout or fix the "
            f"caller's spec")
    # the sort flag is just as load-bearing as the bucket spec: SORTED BY
    # DDL over files written unsorted lets Spark elide the per-query Sort
    # in a bucketed SortMergeJoin — wrong join results, silently (r12
    # ADVICE).  A sort=True layout registered sort=False is merely slower,
    # but reject both directions: the sidecar exists to make the DDL
    # match the files exactly.
    if sort is not None and bool(spec.get("sort")) != bool(sort):
        raise ValueError(
            f"bucketed layout at {path} was written with "
            f"sort={spec.get('sort')} but is being registered with "
            f"sort={sort}; SORTED BY DDL over unsorted files lets Spark "
            f"elide the sort in bucketed joins and return wrong results — "
            f"register with the recorded flag or rewrite the layout")


def write_bucketed_table(df: DataFrame, spark: SparkSession, name: str,
                         path: str, bucket_col: str, n_buckets: int,
                         sort: bool = True,
                         mode: str = "overwrite") -> None:
    """Write `df` as an external bucketed (and optionally per-bucket
    sorted) parquet table at `path`, registered as `name`.

    One shuffle on `bucket_col` at write time buys every later join or
    aggregation on that key an exchange-free plan.  `sort=True` also
    sorts within buckets so SortMergeJoin skips its per-query Sort."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be > 0, got {n_buckets}")
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    w = df.write.mode(mode).option("path", path).format("parquet")
    w = w.bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(name)
    _write_spec(spark, path, bucket_col, n_buckets, sort)


def register_bucketed_table(spark: SparkSession, name: str, path: str,
                            schema_of: DataFrame, bucket_col: str,
                            n_buckets: int, sort: bool = True) -> None:
    """Re-attach an existing bucketed layout (written earlier, possibly by
    another session) to this session's catalog.  The DDL must repeat the
    bucket spec the files were written with — bucket ids live in the file
    NAMES, so a wrong spec here would silently mis-bucket reads.  The
    spec sidecar written by :func:`write_bucketed_table` is validated
    here; a mismatch raises instead of registering."""
    _check_spec(spark, path, bucket_col, n_buckets, sort)
    sorted_by = f"SORTED BY (`{bucket_col}`) " if sort else ""
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    spark.sql(
        f"CREATE TABLE `{name}` ({_ddl_columns(schema_of)}) USING PARQUET "
        f"CLUSTERED BY (`{bucket_col}`) {sorted_by}"
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'")
    spark.sql(f"REFRESH TABLE `{name}`")


def ensure_bucketed_table(spark: SparkSession, df: DataFrame, name: str,
                          path: str, bucket_col: str,
                          n_buckets: int,
                          sort: "bool | None" = None) -> DataFrame:
    """Idempotently materialize-or-attach the bucketed layout and return
    it as a DataFrame: registered → as-is; files present → re-register
    (spec-validated); else → write.  The _SUCCESS marker gates reuse (a
    torn write never registers).

    ``sort=None`` (default) re-attaches with the RECORDED sort flag from
    the spec sidecar — a sort=False layout stays attachable (r13: the
    sort-flag validation would otherwise reject the hardcoded True
    forever) — and writes fresh layouts sorted.  Pass an explicit bool
    to assert a specific expectation instead."""
    if not spark.catalog.tableExists(name):
        if hadoop_exists(spark, f"{path}/_SUCCESS"):
            if sort is None:
                spec = read_bucket_spec(spark, path)
                sort = bool(spec.get("sort", True)) if spec else True
            register_bucketed_table(spark, name, path, df, bucket_col,
                                    n_buckets, sort=sort)
        else:
            write_bucketed_table(df, spark, name, path, bucket_col,
                                 n_buckets,
                                 sort=True if sort is None else sort)
    return spark.table(name)
