"""JDBC source/sink wrappers — the Spark-native rendering of the reference's
pg_dump/mysqldump spawn (S1/S2, /root/reference/replibyte/src/source/
postgres.rs:113-169, mysql.rs:101-163) and psql/mysql restore pipes (K1/K2,
destination/postgres.rs:38-112).

`spark.read.jdbc` partitions the scan (`partitionColumn/numPartitions` —
a parallel dump the reference cannot do), predicate/column pushdown reaches
the database, and `df.write.jdbc(mode="overwrite")` is the wipe+restore.

Raw `jdbc:` URLs pass through untouched, so any driver on the classpath
works — the integration tests run the full read→transform→write→read loop
against Apache Derby (embedded; ships inside Spark itself).  No Postgres/
MySQL server exists in this container, so those flavors are exercised for
option assembly only.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

_DEFAULT_PORTS = {"postgres": 5432, "postgresql": 5432, "mysql": 3306}


def jdbc_options(uri: str, driver: str | None = None) -> dict[str, str]:
    """connection_uri → spark JDBC options (reference parses the same URIs,
    config.rs:464-528).  `postgres://`/`mysql://` URIs are translated; a raw
    `jdbc:` URL (Derby, DuckDB, H2, ...) passes through as-is with the
    optionally given driver class."""
    if uri.startswith("jdbc:"):
        opts = {"url": uri}
        if driver:
            opts["driver"] = driver
        return opts
    u = urlparse(uri)
    scheme = u.scheme
    if scheme not in _DEFAULT_PORTS:
        raise ValueError(f"unsupported JDBC scheme: {scheme}")
    flavor = "postgresql" if scheme.startswith("postgres") else "mysql"
    port = u.port or _DEFAULT_PORTS[scheme]
    db = (u.path or "/").lstrip("/")
    if not db:
        raise ValueError(f"connection uri missing database name: {uri}")
    opts = {
        "url": f"jdbc:{flavor}://{u.hostname}:{port}/{db}",
        "driver": ("org.postgresql.Driver" if flavor == "postgresql"
                   else "com.mysql.cj.jdbc.Driver"),
    }
    if u.username:
        opts["user"] = u.username
    if u.password:
        opts["password"] = u.password
    return opts


def read_jdbc_table(spark: SparkSession, uri: str, table: str,
                    partition_column: str | None = None,
                    num_partitions: int = 32,
                    lower_bound: int | None = None,
                    upper_bound: int | None = None,
                    driver: str | None = None) -> DataFrame:
    """One table scan; pass a numeric `partition_column` to parallelize the
    read across executors (the scale path — a single-stream read like the
    reference's stdout pipe would bottleneck a cluster)."""
    reader = spark.read.format("jdbc").options(
        **jdbc_options(uri, driver), dbtable=table)
    if partition_column:
        reader = reader.options(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound if lower_bound is not None else 0),
            upperBound=str(upper_bound if upper_bound is not None else 1 << 31),
        )
    return reader.load()


def list_jdbc_tables(spark: SparkSession, uri: str,
                     driver: str | None = None) -> list[str]:
    """Table inventory via the engine's catalog (reference `source schema`,
    I1 — source/postgres.rs:308-339)."""
    if ":derby:" in uri:
        q = ("(SELECT tablename FROM sys.systables WHERE tabletype = 'T') t")
    elif ":mysql:" in uri or uri.startswith("mysql:"):
        # MySQL: schemas ARE databases — filter to the connection's current
        # database; the Postgres-style NOT IN filter would sweep in mysql.*,
        # sys.*, performance_schema.* and every other database's tables
        # (and their unqualified names would then read the wrong relations)
        q = ("(SELECT table_name FROM information_schema.tables "
             "WHERE table_schema = database()) t")
    else:
        q = ("(SELECT table_name FROM information_schema.tables "
             "WHERE table_schema NOT IN ('pg_catalog', 'information_schema')) t")
    return [r[0] for r in
            spark.read.format("jdbc")
            .options(**jdbc_options(uri, driver), dbtable=q)
            .load().collect()]


def read_jdbc_tables(spark: SparkSession, uri: str,
                     tables: list[str] | None = None,
                     driver: str | None = None) -> dict[str, DataFrame]:
    names = tables or list_jdbc_tables(spark, uri, driver)
    return {t: read_jdbc_table(spark, uri, t, driver=driver) for t in names}


def write_jdbc_tables(tables: dict[str, DataFrame], uri: str,
                      mode: str = "overwrite",
                      driver: str | None = None) -> None:
    """Restore: mode='overwrite' ≈ the reference's wipe_database=true default
    (destination/postgres.rs:38-73; commands/dump.rs:452)."""
    for t, df in tables.items():
        df.write.format("jdbc").options(
            **jdbc_options(uri, driver), dbtable=t).mode(mode).save()


def fk_edges_from_jdbc(spark: SparkSession, uri: str,
                       driver: str | None = None,
                       schema: str | None = None) -> list:
    """FK graph from the LIVE database catalog (SS1).  The reference
    parses `ALTER TABLE ... FOREIGN KEY` DDL back out of the dump text
    (subset/src/postgres.rs:583-734); the JDBC `DatabaseMetaData
    .getImportedKeys` catalog API yields the same facts uniformly for
    Postgres, MySQL and embedded engines (Derby — the flavor this repo
    can execute live).  Driver-side: one bounded metadata call per table,
    no Spark job.  Names are lowercased to match the DataFrame-dict keys
    the pipelines use (unquoted SQL identifiers are case-insensitive).

    `FkEdge` carries BARE table names (the reference addresses tables as
    `{database}.{table}`, transformer/mod.rs:60-76, and the pipelines key
    their DataFrame dicts the same way), so when the SAME table name
    exists in two schemas the graphs would silently merge.  Guard: pass
    `schema` (a JDBC schemaPattern, e.g. ``"APP"``) to scope the walk to
    one schema; without it, a cross-schema name collision raises instead
    of returning an ambiguous graph."""
    from ..operators.subset import FkEdge

    opts = jdbc_options(uri, driver)
    jvm = spark._jvm
    if "driver" in opts:
        jvm.java.lang.Class.forName(opts["driver"])
    props = jvm.java.util.Properties()
    for k in ("user", "password"):
        if k in opts:
            props.setProperty(k, opts[k])
    conn = jvm.java.sql.DriverManager.getConnection(opts["url"], props)
    try:
        md = conn.getMetaData()
        names = []
        rs = md.getTables(None, schema, "%", None)
        while rs.next():
            if rs.getString("TABLE_TYPE") == "TABLE":
                names.append((rs.getString("TABLE_SCHEM"),
                              rs.getString("TABLE_NAME")))
        rs.close()
        by_name: dict[str, set] = {}
        for schem, t in names:
            by_name.setdefault(t.lower(), set()).add(schem)
        dupes = {t: s for t, s in by_name.items() if len(s) > 1}
        if dupes:
            detail = ", ".join(
                f"{t} (schemas {'/'.join(sorted(s))})"
                for t, s in sorted(dupes.items()))
            raise ValueError(
                f"table name(s) present in multiple schemas: {detail} — "
                f"FkEdge uses bare table names, so the FK graphs would "
                f"merge; pass schema=<name> to scope the extraction")
        edges = []
        for schem, t in names:
            rs = md.getImportedKeys(None, schem, t)
            while rs.next():
                edges.append(FkEdge(
                    child=rs.getString("FKTABLE_NAME").lower(),
                    fk_col=rs.getString("FKCOLUMN_NAME").lower(),
                    parent=rs.getString("PKTABLE_NAME").lower(),
                    parent_col=rs.getString("PKCOLUMN_NAME").lower()))
            rs.close()
        return edges
    finally:
        conn.close()
