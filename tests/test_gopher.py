"""Gopher quality rules (functions/gopher.py): per-rule trigger tests on
constructed documents, degenerate inputs, the zero-shuffle plan lock, and
cross-engine parity of every flag on the same fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from replibyte_spark.functions.gopher import (GOPHER_RULES, gopher_filter,
                                              gopher_flags)

# a clean passing document: >=50 words of ordinary English prose
GOOD = ("the quick brown fox jumps over the lazy dog and then runs back "
        "to the old farm house where it used to live with many other "
        "animals that have been there for years and they all like to "
        "play together in the big green field near the river bank "
        "under the warm afternoon sun with their friends")

CASES = {
    # rule violated -> constructed text
    "word_count": "too few words here",
    "mean_word_len": "a b c d e f g h i j " * 10,     # mean len 1
    "symbol_ratio": ("# " * 30) + "the words have with that be to of and",
    "bullet_lines": "\n".join(["• item the be to of"] * 9 + [GOOD]),
    "ellipsis_lines": "\n".join(["the story continues..."] * 9 + [GOOD]),
    "alpha_words": ("123 456 789 000 111 " * 12) + "the be",
    "stop_words": "perro gato casa jardin arbol flor cielo tierra " * 8,
}


def _flags(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict()
            for r in gopher_flags(df).collect()}


def test_good_document_passes_all_rules(spark):
    out = _flags(spark, [(1, GOOD)])[1]
    for rule in GOPHER_RULES:
        assert out[f"gq_{rule}"] is True, rule
    assert out["gopher_pass"] is True


def test_each_rule_triggers_independently(spark):
    rows = [(i, CASES[rule])
            for i, rule in enumerate(sorted(CASES))]
    out = _flags(spark, rows)
    for i, rule in enumerate(sorted(CASES)):
        assert out[i][f"gq_{rule}"] is False, \
            (rule, CASES[rule][:50], out[i])
        assert out[i]["gopher_pass"] is False


def test_degenerate_inputs_fail_closed(spark):
    out = _flags(spark, [(1, None), (2, ""), (3, "   \n\t ")])
    for i in (1, 2, 3):
        assert out[i]["gopher_pass"] is False
        # zero-word docs: word-count, mean-len and alpha rules all fail
        assert out[i]["gq_word_count"] is False
        assert out[i]["gq_mean_word_len"] is False
        assert out[i]["gq_alpha_words"] is False


def test_filter_keeps_only_passing_and_drops_flags(spark):
    df = spark.createDataFrame(
        [(1, GOOD), (2, CASES["word_count"])],
        "doc_id long, text string")
    kept = gopher_filter(df)
    assert [r["doc_id"] for r in kept.collect()] == [1]
    assert set(kept.columns) == {"doc_id", "text"}


def test_gopher_is_single_projection_no_shuffle(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = gopher_flags(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEval" not in plan


def test_gopher_flags_match_duckdb_rendering(spark):
    """Every flag, bit-identical across engines on the constructed
    fixtures (integer cross-multiplied thresholds — no float surface)."""
    import duckdb

    from replibyte_spark import dialect as D
    from replibyte_spark.functions.gopher import (gopher_flag_sqls,
                                                  gopher_stats_sql)

    texts = [GOOD, *CASES.values(), "", "   \n\t ",
             "• the\n- be\n* to\nplain of line"]
    rows = [(i, t) for i, t in enumerate(texts)]
    spark_rows = _flags(spark, rows)
    con = duckdb.connect()
    flags = gopher_flag_sqls(gopher_stats_sql(D.DUCK, "text"))
    sel = ", ".join(f"{sql} AS {rule}" for rule, sql in flags.items())
    for i, t in rows:
        con.execute("CREATE OR REPLACE TABLE d AS SELECT ? AS text", [t])
        duck = con.execute(f"SELECT {sel} FROM d").fetchone()
        for j, rule in enumerate(flags):
            assert bool(duck[j]) == spark_rows[i][f"gq_{rule}"], \
                (rule, t[:40], duck[j], spark_rows[i][f"gq_{rule}"])
