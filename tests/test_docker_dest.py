"""Docker-container destinations (reference K4 —
destination/docker.rs + postgres/mysql/mongodb_docker.rs): the full
command plan is asserted through the dry-run runner (this sandbox has
no Docker daemon — neither does the reference's CI, whose destination
tests require one and simply don't run); a live smoke test auto-skips
unless a daemon is reachable."""

from __future__ import annotations

import shutil

import pytest

from replibyte_spark.sinks.docker_dest import (DockerRunner,
                                               mongo_docker, mysql_docker,
                                               postgres_docker,
                                               render_sql_payload,
                                               restore_into_container)

FAKE_ID = b"0123456789abcdef0123456789abcdef0123456789abcdef\n"


def test_postgres_plan_run_probe_pipe(spark):
    """start → ready-poll → pipe: the exact argv sequence the reference
    executes (docker.rs run/-p/-e/-d, exec -i <id12> /bin/bash -c),
    with the readiness poll replacing its hardcoded 20 s sleep."""
    r = DockerRunner(dry_run=True)
    r.script = [
        (0, FAKE_ID, b""),          # docker run
        (1, b"", b"starting"),      # pg_isready: not yet
        (0, b"", b""),              # pg_isready: ready
        (0, b"", b""),              # psql pipe
    ]
    dest = postgres_docker(5433, tag="13", runner=r)
    tables = {"nation": spark.createDataFrame(
        [(1, "FRANCE")], "n_nationkey long, n_name string")}
    cid = restore_into_container(tables, dest, dialect="postgres")
    assert cid == FAKE_ID.decode().strip()[:12]  # docker.rs id[..12]

    run, probe1, probe2, pipe = r.calls
    assert run.argv[:3] == ["run", "-p", "5433:5432"]
    assert run.argv[3:7] == ["-e", "POSTGRES_PASSWORD=password",
                             "-e", "POSTGRES_USER=postgres"]
    assert run.argv[7:] == ["-d", "postgres:13"]
    for c in (probe1, probe2):
        assert c.argv[:4] == ["exec", "-i", cid, "/bin/bash"]
        assert "pg_isready" in c.argv[5]
    assert "psql" in pipe.argv[5] and "ON_ERROR_STOP=1" in pipe.argv[5]
    sql = pipe.stdin.decode()
    assert "DROP TABLE IF EXISTS nation;" in sql
    assert "CREATE TABLE nation (n_nationkey BIGINT, n_name TEXT);" in sql
    assert "INSERT INTO nation (n_nationkey, n_name) VALUES (1, 'FRANCE');" \
        in sql
    assert sql.startswith("BEGIN;") and sql.rstrip().endswith("COMMIT;")
    # container left running for the developer (reference behavior)
    assert dest.container_id == cid


def test_mysql_plan_has_native_password_command():
    """mysql_docker.rs:46-49: the container command is mysqld with the
    native-password plugin, appended after the image."""
    r = DockerRunner(dry_run=True)
    r.script = [(0, FAKE_ID, b""), (0, b"", b"")]
    dest = mysql_docker(3307, tag="8", runner=r)
    dest.start()
    run = r.calls[0]
    i = run.argv.index("-d")
    assert run.argv[i + 1] == "mysql:8"
    assert run.argv[i + 2:] == [
        "mysqld", "--default-authentication-plugin=mysql_native_password"]
    assert ["-e", "MYSQL_ROOT_PASSWORD=password"] == \
        [x for x in run.argv if "ROOT_PASSWORD" in x or x == "-e"][1:3] \
        or "MYSQL_ROOT_PASSWORD=password" in run.argv


def test_mongo_pipe_strips_trailing_nul():
    """mongodb_docker.rs:71: mongorestore rejects the archive's trailing
    NUL on stdin; the destination strips exactly that byte."""
    r = DockerRunner(dry_run=True)
    r.script = [(0, FAKE_ID, b""), (0, b"", b""), (0, b"", b"")]
    dest = mongo_docker(27018, runner=r)
    dest.start()
    dest.write(b"archive-bytes\x00")
    pipe = r.calls[-1]
    assert "mongorestore" in pipe.argv[5] and "--archive" in pipe.argv[5]
    assert pipe.stdin == b"archive-bytes"


def test_ready_poll_times_out_with_probe_stderr():
    """A container that never comes ready must not keep running and
    holding the host port (r13 review): the timeout tears it down."""
    r = DockerRunner(dry_run=True)
    r.script = [(0, FAKE_ID, b""), (1, b"", b"connection refused")]
    dest = postgres_docker(5433, runner=r, ready_timeout=0)
    with pytest.raises(TimeoutError, match="connection refused"):
        dest.start()
    assert r.calls[-2].argv[0] == "stop"
    assert r.calls[-1].argv[:2] == ["rm", "-f"]
    assert dest.container_id is None


def test_mysql_payload_pins_standard_literals(spark):
    """INSERT literals are quote-doubled (standard SQL); MySQL's default
    mode also treats backslash as an escape, silently corrupting any
    value containing one — the mysql payload pins the session to
    NO_BACKSLASH_ESCAPES before the transaction (r13 review)."""
    df = spark.createDataFrame([(1, "C:\\tmp\\x")], "k long, s string")
    my = render_sql_payload({"t": df}, dialect="mysql").decode()
    lines = my.splitlines()
    assert lines[0] == "SET SESSION sql_mode = 'NO_BACKSLASH_ESCAPES';"
    assert lines[1] == "START TRANSACTION;"
    assert "'C:\\tmp\\x'" in my  # backslashes pass through verbatim
    pg = render_sql_payload({"t": df}, dialect="postgres").decode()
    assert "sql_mode" not in pg  # postgres literals are standard already


def test_mysql_probe_and_client_use_tcp():
    """The mysql entrypoint's temporary bootstrap server (init phase)
    runs --skip-networking: a socket-level ping would report ready
    during init and the restore pipe would race the entrypoint's server
    restart.  TCP-only probe+client reach the REAL server (r13
    review)."""
    from replibyte_spark.sinks.docker_dest import mysql_docker as mk

    spec = mk(3307, runner=DockerRunner(dry_run=True)).spec
    assert "-h 127.0.0.1" in spec.probe_cmd
    assert "SELECT 1" in spec.probe_cmd
    assert "-h 127.0.0.1" in spec.client_cmd
    assert "mysqladmin" not in spec.probe_cmd


def test_runner_normalizes_subprocess_timeout():
    """A wedged docker CLI call must surface as RuntimeError (the type
    every caller's loud-failure path handles), not an unhandled
    subprocess.TimeoutExpired traceback (r13 review)."""
    r = DockerRunner(dry_run=False, binary="sleep")
    with pytest.raises(RuntimeError, match="timed out"):
        r.run(["5"], timeout=0.2)


def test_destination_for_defaults_and_unknown_engine():
    from replibyte_spark.sinks.docker_dest import destination_for

    r = DockerRunner(dry_run=True)
    d = destination_for("postgresql", None, None, runner=r)
    assert d.host_port == 5432 and d.spec.tag == "13"
    d = destination_for("mysql", 3310, "8.4", runner=r)
    assert d.host_port == 3310 and d.spec.tag == "8.4"
    with pytest.raises(ValueError, match="unknown docker destination"):
        destination_for("oracle", None, None, runner=r)


def test_failed_pipe_raises_and_cleans_up(spark):
    """A failing restore pipe must surface the client's stderr and tear
    the container down (no zombie containers from a bad dump)."""
    r = DockerRunner(dry_run=True)
    r.script = [
        (0, FAKE_ID, b""),   # run
        (0, b"", b""),       # probe ok
        (1, b"", b"syntax error at line 3"),  # psql fails
        (0, b"", b""),       # stop
        (0, b"", b""),       # rm
    ]
    dest = postgres_docker(5433, runner=r)
    tables = {"t": spark.createDataFrame([(1,)], "a long")}
    with pytest.raises(RuntimeError, match="syntax error"):
        restore_into_container(tables, dest, dialect="postgres")
    assert r.calls[-2].argv[0] == "stop"
    assert r.calls[-1].argv[:2] == ["rm", "-f"]
    assert dest.container_id is None


def test_render_sql_payload_dialects_and_append_mode(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "x")], "k long, v double, s string")
    pg = render_sql_payload({"t": df}, dialect="postgres").decode()
    assert "v DOUBLE PRECISION" in pg and pg.startswith("BEGIN;")
    my = render_sql_payload({"t": df}, dialect="mysql").decode()
    assert "v DOUBLE" in my and "DOUBLE PRECISION" not in my
    assert "START TRANSACTION;" in my.splitlines()[:2]
    soft = render_sql_payload({"t": df}, wipe=False).decode()
    assert "DROP TABLE" not in soft
    assert "CREATE TABLE IF NOT EXISTS t" in soft


def test_restore_pipeline_scheme_wiring(spark, sf_dir, tmp_path):
    """The docker+postgres destination is reachable through the restore
    pipeline's URI scheme, and on a machine without Docker it fails
    LOUDLY with guidance (never a silent no-op restore)."""
    from replibyte_spark.config import Config
    from replibyte_spark.plans.pipeline import DumpPipeline, RestorePipeline

    cfg = Config.from_dict({
        "source": {"connection_uri": f"parquet://{sf_dir}",
                   "only_tables": [{"table": "nation"}]},
        "datastore": {"dir": str(tmp_path / "store")},
    })
    DumpPipeline(cfg).run(spark, "d1")
    cfg2 = Config.from_dict({
        "source": {"connection_uri": f"parquet://{sf_dir}"},
        "datastore": {"dir": str(tmp_path / "store")},
        "destination": {"connection_uri": "docker+postgres://13:5433"},
    })
    if not DockerRunner().available():  # binary missing OR daemon down
        with pytest.raises(RuntimeError, match="docker binary not found"):
            RestorePipeline(cfg2).run(spark, "d1")
    else:  # pragma: no cover — live daemon available
        RestorePipeline(cfg2).run(spark, "d1")
    # a typo'd port is a configuration error, not an int() traceback
    cfg3 = Config.from_dict({
        "source": {"connection_uri": f"parquet://{sf_dir}"},
        "datastore": {"dir": str(tmp_path / "store")},
        "destination": {"connection_uri": "docker+postgres://13:54x3"},
    })
    with pytest.raises(ValueError, match="invalid docker destination URI"):
        RestorePipeline(cfg3).run(spark, "d1")


@pytest.mark.skipif(shutil.which("docker") is None
                    or not DockerRunner().available(),
                    reason="no reachable docker daemon in this environment")
def test_live_container_roundtrip(spark):  # pragma: no cover
    """Full live K4 loop when a daemon exists: start postgres, pipe a
    two-row dump, read it back over JDBC, tear down."""
    r = DockerRunner()
    dest = postgres_docker(5455, runner=r)
    tables = {"nation": spark.createDataFrame(
        [(1, "FRANCE"), (2, "GERMANY")],
        "n_nationkey long, n_name string")}
    try:
        restore_into_container(tables, dest, dialect="postgres")
        back = (spark.read.format("jdbc")
                .option("url", "jdbc:postgresql://localhost:5455/postgres")
                .option("dbtable", "nation")
                .option("user", "postgres").option("password", "password")
                .load())
        assert back.count() == 2
    finally:
        dest.stop()
        dest.rm()
