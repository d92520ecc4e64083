"""Script-aware token counting (functions/text.py::
token_count_multiscript_sql): pinned-definition behavior on CJK / Thai /
mixed corpora, agreement with the whitespace count on spaced scripts,
and cross-engine parity."""

from __future__ import annotations

import duckdb
import pytest

from replibyte_spark import dialect as D
from replibyte_spark.functions.text import (nospace_char_count_sql,
                                            token_count_multiscript_sql,
                                            token_count_sql)

CASES = [
    # (text, expected multiscript tokens)
    ("the quick brown fox", 4),              # pure Latin: = ws count
    ("собака и кошка", 3),                   # Cyrillic is a spaced script
    ("今日は良い天気です", 9),                 # pure CJK: one per char
    ("猫と犬が遊ぶ", 6),
    ("แมวและสุนัข", 11),                      # Thai: one per char
    ("the 漢字 test", 4),                     # CJK-only token: 2 chars
    ("mix漢字ed word", 4),                    # mixed token: 1 + 2 chars
    ("a  b\n c", 3),                          # whitespace runs collapse
    ("", 0),
    (None, None),
    ("   ", 0),
    ("ひらがな and カタカナ", 9),              # kana both count per char
]


def test_multiscript_counts_spark(spark):
    rows = [(i, t) for i, (t, _) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {r.i: r.n for r in df.selectExpr(
        "i", f"{token_count_multiscript_sql(D.SPARK, 't')} AS n"
    ).collect()}
    for i, (t, want) in enumerate(CASES):
        assert got[i] == want, (repr(t), got[i], want)


def test_multiscript_counts_duckdb():
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, t) for i, (t, _) in enumerate(CASES)])
    got = dict(con.execute(
        f"SELECT i, {token_count_multiscript_sql(D.DUCK, 'v')} FROM t"
    ).fetchall())
    for i, (t, want) in enumerate(CASES):
        assert got[i] == want, (repr(t), got[i], want)


def test_pure_latin_equals_ws_count(spark):
    """On spaced scripts the two counters must agree exactly — budgets
    computed with either are interchangeable for Latin corpora."""
    texts = ["one two three", "tab\tsep", "ünïcödé wörds stay spaced",
             "punct, still. works!", "numbers 123 456"]
    df = spark.createDataFrame(list(enumerate(texts)), "i long, t string")
    rows = df.selectExpr(
        f"{token_count_sql(D.SPARK, 't')} AS ws",
        f"{token_count_multiscript_sql(D.SPARK, 't')} AS ms").collect()
    for r in rows:
        assert r.ws == r.ms


def test_nospace_char_count(spark):
    df = spark.createDataFrame(
        [(1, "abc漢字def"), (2, "แมว"), (3, "latin only"), (4, None)],
        "i long, t string")
    got = {r.i: r.n for r in df.selectExpr(
        "i", f"{nospace_char_count_sql(D.SPARK, 't')} AS n").collect()}
    assert got == {1: 2, 2: 3, 3: 0, 4: 0}
