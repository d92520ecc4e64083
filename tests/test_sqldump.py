"""SQL-dump parser tests mirroring the reference's golden splitter cases
(dump-parser/src/utils.rs:304-948) and to_query re-encoding
(source/postgres.rs:620-714)."""

from __future__ import annotations

from replibyte_spark.sources.sqldump import parse_insert, split_statements


def test_split_basic():
    text = "CREATE TABLE t (a int);\nINSERT INTO t (a) VALUES (1);\n"
    assert list(split_statements(text)) == [
        "CREATE TABLE t (a int);", "INSERT INTO t (a) VALUES (1);"]


def test_split_embedded_semicolon_in_string():
    """utils.rs golden: `;` inside a string literal must not split."""
    text = "INSERT INTO t (a) VALUES ('x; y');"
    assert list(split_statements(text)) == ["INSERT INTO t (a) VALUES ('x; y');"]


def test_split_quote_escapes():
    """'' escapes stay inside one statement (utils.rs cases); backslash
    escapes are mysql-dialect only (postgres treats \\ literally)."""
    text = "INSERT INTO t (a) VALUES ('it''s; fine');INSERT INTO t (a) VALUES ('x');"
    got = list(split_statements(text))
    assert len(got) == 2
    assert got[0] == "INSERT INTO t (a) VALUES ('it''s; fine');"
    my = "INSERT INTO t (a) VALUES ('b\\'; c');"
    assert list(split_statements(my, dialect="mysql")) == [my]


def test_split_comments_removed():
    text = "-- a comment; with semicolon\nINSERT INTO t (a) VALUES (1);"
    assert list(split_statements(text)) == ["INSERT INTO t (a) VALUES (1);"]


def test_split_multiline_statement():
    text = "INSERT INTO t (a, b)\nVALUES (1,\n2);"
    assert list(split_statements(text)) == ["INSERT INTO t (a, b)\nVALUES (1,\n2);"]


def test_split_dollar_quoted_function_body():
    """utils.rs: CREATE OR REPLACE FUNCTION bodies with embedded `;`."""
    fn = "CREATE FUNCTION f() RETURNS int AS $$ BEGIN RETURN 1; END $$ LANGUAGE plpgsql;"
    got = list(split_statements(fn + "\nINSERT INTO t (a) VALUES (1);"))
    assert len(got) == 2 and got[0].startswith("CREATE FUNCTION")


def test_parse_insert_typed_cells():
    """Typed-cell decoding (postgres.rs:375-412): int/float/string/bool/NULL."""
    t, cols, vals = parse_insert(
        "INSERT INTO public.users (id, name, score, active, note) "
        "VALUES (42, 'O''Hara', 1.5, TRUE, NULL);")
    assert t == "users"
    assert cols == ["id", "name", "score", "active", "note"]
    assert vals == [42, "O'Hara", 1.5, True, None]


def test_parse_insert_quoted_identifiers():
    """Quote-preserving column projection (postgres/mod.rs:973-995)."""
    t, cols, vals = parse_insert(
        'INSERT INTO "MyTable" ("upperCaseColumnName", x) VALUES (\'v\', -7);')
    assert t == "MyTable"
    assert cols == ["upperCaseColumnName", "x"]
    assert vals == ["v", -7]


def test_parse_insert_commas_inside_strings():
    _t, _c, vals = parse_insert(
        "INSERT INTO t (a, b) VALUES ('x, y', 'z (1,2)');")
    assert vals == ["x, y", "z (1,2)"]


def test_parse_non_insert_returns_none():
    assert parse_insert("CREATE TABLE t (a int);") is None
    assert parse_insert("ALTER TABLE t ADD CONSTRAINT c;") is None


def test_roundtrip_through_text(spark, sf_dir, tmp_path):
    """nation → INSERT text → parse back → identical rows (re-encoder
    semantics of source/postgres.rs:620-714)."""
    from replibyte_spark.catalog import load_table
    from replibyte_spark.sinks.sqldump_sink import write_sql_dump
    from replibyte_spark.sources.sqldump import read_sql_dump

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "dump")
    write_sql_dump(nation, "nation", path)
    back = read_sql_dump(spark, path)["nation"]
    assert back.columns == nation.columns
    got = sorted((int(r[0]), r[1], int(r[2])) for r in back.collect())
    want = sorted(tuple(r) for r in nation.collect())
    assert got == want
