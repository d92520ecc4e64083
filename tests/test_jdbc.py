"""End-to-end JDBC tests against Apache Derby — an embedded SQL database
that ships on Spark's own classpath, so `.load()`/`.save()` actually
execute (S1/S2/K1/K2 surface: reference source/postgres.rs:566-617,
destination/postgres.rs:38-112).  Postgres/MySQL flavors are covered at
the option-assembly level (no server in this container); the Spark JDBC
code path below them is identical.
"""

from __future__ import annotations

import pytest

from replibyte_spark.catalog import load_table
from replibyte_spark.sources.jdbc import (
    jdbc_options,
    list_jdbc_tables,
    read_jdbc_table,
    read_jdbc_tables,
    write_jdbc_tables,
)

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def test_jdbc_options_translation():
    opts = jdbc_options("postgres://u:p@h:5433/mydb")
    assert opts == {
        "url": "jdbc:postgresql://h:5433/mydb",
        "driver": "org.postgresql.Driver",
        "user": "u",
        "password": "p",
    }
    assert jdbc_options("mysql://h/db")["url"] == "jdbc:mysql://h:3306/db"
    raw = jdbc_options("jdbc:derby:/tmp/x;create=true", driver=DERBY)
    assert raw == {"url": "jdbc:derby:/tmp/x;create=true", "driver": DERBY}
    with pytest.raises(ValueError):
        jdbc_options("ftp://h/db")


def test_jdbc_write_list_read_roundtrip(spark, sf_dir, tmp_path):
    """dump → restore loop: write two fixture tables into Derby, list them
    from the catalog, read them back, values must survive exactly."""
    uri = f"jdbc:derby:{tmp_path}/gatedb;create=true"
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    write_jdbc_tables({"nation": nation, "supplier": supplier}, uri,
                      driver=DERBY)

    names = {t.lower() for t in list_jdbc_tables(spark, uri, driver=DERBY)}
    assert {"nation", "supplier"} <= names

    back = read_jdbc_tables(spark, uri, ["nation", "supplier"], driver=DERBY)
    got = sorted((r.n_nationkey, r.n_name, r.n_regionkey)
                 for r in back["nation"].collect())
    want = sorted((r.n_nationkey, r.n_name, r.n_regionkey)
                  for r in nation.collect())
    assert got == want
    assert back["supplier"].count() == supplier.count()

    # overwrite mode = wipe+restore (idempotent re-run must not duplicate)
    write_jdbc_tables({"nation": nation}, uri, driver=DERBY)
    assert read_jdbc_table(spark, uri, "nation",
                           driver=DERBY).count() == nation.count()


def test_jdbc_partitioned_read(spark, sf_dir, tmp_path):
    """The scale path: partitionColumn splits the scan into parallel range
    queries — the parallel dump the reference's single pg_dump pipe can't
    do."""
    uri = f"jdbc:derby:{tmp_path}/pdb;create=true"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    write_jdbc_tables({"orders": orders}, uri, driver=DERBY)
    back = read_jdbc_table(spark, uri, "orders",
                           partition_column="o_orderkey", num_partitions=4,
                           lower_bound=0, upper_bound=1 << 20, driver=DERBY)
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == orders.count()


def test_config_driven_jdbc_pipeline(spark, sf_dir, tmp_path):
    """The reference's full lifecycle against a real database: seed Derby,
    dump (with a transformer) through the datastore, restore into a SECOND
    Derby database, read that back over JDBC and check the transform
    applied (reference: commands/dump.rs -> tasks/full_dump.rs +
    full_restore.rs, with pg replaced by the embedded engine)."""
    from replibyte_spark.config import Config
    from replibyte_spark.plans.pipeline import DumpPipeline, RestorePipeline

    src_uri = f"jdbc:derby:{tmp_path}/srcdb;create=true"
    dst_uri = f"jdbc:derby:{tmp_path}/dstdb;create=true"
    nation = load_table(spark, sf_dir, "nation")
    write_jdbc_tables({"nation": nation}, src_uri, driver=DERBY)

    cfg = Config.from_yaml(f"""
source:
  connection_uri: "{src_uri}"
  jdbc_driver: {DERBY}
  only_tables: [{{table: nation}}]
  transformers:
    - table: nation
      columns:
        - name: n_name
          transformer_name: redacted
datastore:
  local_disk:
    dir: "{tmp_path / 'store'}"
destination:
  connection_uri: "{dst_uri}"
  jdbc_driver: {DERBY}
""")
    DumpPipeline(cfg).run(spark, "jd1")
    RestorePipeline(cfg).run(spark, "jd1")

    back = read_jdbc_table(spark, dst_uri, "nation", driver=DERBY)
    rows = {r.n_nationkey: r.n_name for r in back.collect()}
    src = {r.n_nationkey: r.n_name for r in nation.collect()}
    assert set(rows) == set(src)
    # redacted: first 3 chars kept, rest masked — never the original value
    assert all(v != src[k] and v.startswith(src[k][:3])
               for k, v in rows.items())


def test_fk_edges_from_jdbc_and_config_subset(spark, tmp_path):
    """FK-graph extraction from the LIVE Derby catalog
    (DatabaseMetaData.getImportedKeys — the uniform JDBC path PG/MySQL
    also take), then a config-driven subset dump over that source: the
    dumped child rows' FK targets must all be present (RI closure ran
    with the EXTRACTED edges, not an empty graph)."""
    from replibyte_spark.config import Config
    from replibyte_spark.operators.subset import FkEdge
    from replibyte_spark.plans.pipeline import DumpPipeline
    from replibyte_spark.sinks.datastore import Datastore
    from replibyte_spark.sources.jdbc import fk_edges_from_jdbc

    uri = f"jdbc:derby:{tmp_path}/fkdb;create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DERBY)
    conn = jvm.java.sql.DriverManager.getConnection(uri)
    st = conn.createStatement()
    st.execute("CREATE TABLE region (id INT PRIMARY KEY, name VARCHAR(20))")
    st.execute("CREATE TABLE nation (id INT PRIMARY KEY, region_id INT "
               "REFERENCES region(id))")
    for i in range(4):
        st.execute(f"INSERT INTO region VALUES ({i}, 'r{i}')")
    for i in range(20):
        st.execute(f"INSERT INTO nation VALUES ({i}, {i % 4})")
    st.close()
    conn.close()

    edges = fk_edges_from_jdbc(spark, uri, driver=DERBY)
    assert edges == [FkEdge("nation", "region_id", "region", "id")]

    conf = Config.from_dict({
        "source": {
            "connection_uri": uri,
            "only_tables": [{"table": "nation"}, {"table": "region"}],
            "database_subset": {"table": "nation",
                                "strategy_name": "random",
                                "strategy_options": {"percent": 40}},
        },
        "datastore": {"dir": str(tmp_path / "store")},
    })
    pipe = DumpPipeline(conf)
    pipe.config.source.jdbc_driver = DERBY
    info = pipe.run(spark, "sub")
    back = Datastore(spark, str(tmp_path / "store")).restore("sub")
    # Derby stores unquoted identifiers uppercase; Spark COLUMN resolution
    # is case-insensitive (the closure's lowercase fk columns resolved),
    # but Row field access is not
    nations = [r.asDict() for r in back["nation"].collect()]
    regions = {r["ID"] for r in back["region"].collect()}
    assert 0 < len(nations) < 20                 # genuinely subset
    assert {n["REGION_ID"] for n in nations} <= regions   # RI closure held
    assert sorted(info.tables) == ["nation", "region"]


def test_fk_edges_two_schemas_same_table_name(spark, tmp_path):
    """Two schemas holding the SAME table name with DIFFERENT FK graphs:
    unscoped extraction must refuse (FkEdge carries bare names — the
    graphs would silently merge), and schema-scoped extraction must
    return each schema's own distinct graph (the reference's
    `{database}.{table}` addressing, transformer/mod.rs:60-76)."""
    import pytest as _pytest

    from replibyte_spark.operators.subset import FkEdge
    from replibyte_spark.sources.jdbc import fk_edges_from_jdbc

    uri = f"jdbc:derby:{tmp_path}/twoschema;create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DERBY)
    conn = jvm.java.sql.DriverManager.getConnection(uri)
    st = conn.createStatement()
    # schema A: child -> parent_a ; schema B: child -> parent_b
    st.execute("CREATE SCHEMA sa")
    st.execute("CREATE SCHEMA sb")
    st.execute("CREATE TABLE sa.parent_a (id INT PRIMARY KEY)")
    st.execute("CREATE TABLE sa.child (id INT PRIMARY KEY, "
               "pa_id INT REFERENCES sa.parent_a(id))")
    st.execute("CREATE TABLE sb.parent_b (id INT PRIMARY KEY)")
    st.execute("CREATE TABLE sb.child (id INT PRIMARY KEY, "
               "pb_id INT REFERENCES sb.parent_b(id))")
    st.close()
    conn.close()

    with _pytest.raises(ValueError, match="multiple schemas"):
        fk_edges_from_jdbc(spark, uri, driver=DERBY)

    ea = fk_edges_from_jdbc(spark, uri, driver=DERBY, schema="SA")
    eb = fk_edges_from_jdbc(spark, uri, driver=DERBY, schema="SB")
    assert ea == [FkEdge("child", "pa_id", "parent_a", "id")]
    assert eb == [FkEdge("child", "pb_id", "parent_b", "id")]
