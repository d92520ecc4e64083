"""C4 cleaning rules (functions/c4.py): per-rule trigger tests at the
published defaults on constructed pages, cleaned-text replacement,
parameterization, cross-engine flag parity, and the zero-shuffle plan
lock."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from replibyte_spark import dialect as D
from replibyte_spark.functions.c4 import (C4_DOC_RULES, c4_filter,
                                          c4_flag_sqls, c4_flags,
                                          c4_stats_sql)

# five clean sentences on their own lines, each >= 3 words, terminal punct
GOOD = "\n".join([
    "the quick brown fox jumps over the lazy dog.",
    "it runs across the wide green field every morning!",
    "where does the river bend beyond the old mill?",
    "the farmer watched it from the wooden fence.",
    'he said "that fox is back again today."',
])

CASES = {
    # doc rule violated -> constructed page
    "min_sentences": "one good sentence is not enough here.",
    "lorem_ipsum": GOOD + "\nLorem Ipsum dolor sit amet filler text.",
    "curly_brace": GOOD + "\nfunction f() { return 1; } and more words.",
    "bad_words": GOOD + "\nthe forbidden zzz word appears right here.",
}


def _flags(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict()
            for r in c4_flags(df, **kw).collect()}


def test_good_page_passes_all_rules(spark):
    out = _flags(spark, [(1, GOOD)], bad_words=("zzz",))[1]
    for rule in C4_DOC_RULES:
        assert out[f"c4_{rule}"] is True, rule
    assert out["c4_pass"] is True
    assert out["c4_text"] == GOOD          # every line survives
    assert out["c4_lines_kept"] == 5


def test_each_doc_rule_triggers_independently(spark):
    rows = [(i, CASES[rule]) for i, rule in enumerate(sorted(CASES))]
    out = _flags(spark, rows, bad_words=("zzz",))
    for i, rule in enumerate(sorted(CASES)):
        assert out[i][f"c4_{rule}"] is False, (rule, out[i])


def test_line_rules_drop_the_right_lines(spark):
    page = "\n".join([
        "this line ends without punctuation",        # no terminal punct
        "too few.",                                   # < 3 words
        "this line mentions JavaScript libraries.",   # javascript
        "this perfectly ordinary line survives intact.",
    ])
    out = _flags(spark, [(1, page)])[1]
    assert out["c4_text"] == "this perfectly ordinary line survives intact."
    assert out["c4_lines_kept"] == 1
    assert out["c4_lines_total"] == 4


def test_sentence_count_spans_kept_lines(spark):
    # two kept lines carrying 5 terminal marks total -> passes rule 4
    page = ("one. two. three ok here?\n"
            "four clearly happens! five ends now.")
    out = _flags(spark, [(1, page)])[1]
    assert out["c4_min_sentences"] is True
    # same text but one mark fewer fails
    page2 = ("one. two. three ok here?\n"
             "four clearly happens and then stops!")
    out2 = _flags(spark, [(1, page2)])[1]
    assert out2["c4_min_sentences"] is False


def test_filter_replaces_text_with_kept_lines(spark):
    rows = [(1, GOOD + "\nnoise line without any ending"),
            (2, "short page.")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = c4_filter(df).collect()
    assert [r["doc_id"] for r in kept] == [1]
    assert kept[0]["text"] == GOOD
    assert c4_filter(df).columns == ["doc_id", "text"]


def test_custom_terminal_punct_drives_sentence_count(spark):
    """r11 ADVICE fix: c4_stats_sql must count sentences over the
    CALLER's terminal_punct, not the module default — a '!'-only caller
    used to get line-filtering on '!' but sentence counts on '.?!"'."""
    # three lines each ending in '!', each also containing enough words;
    # the '.' marks inside must NOT count as sentences
    page = ("alpha. beta. gamma delta epsilon keeps this line going on!\n"
            "zeta. eta. theta iota kappa keeps this line going onward!\n"
            "lambda mu nu xi omicron pi rho sigma tau ends right here!")
    out = _flags(spark, [(1, page)], terminal_punct=("!",),
                 min_sentences=3)[1]
    assert out["c4_lines_kept"] == 3
    assert out["c4_min_sentences"] is True  # exactly 3 '!' marks
    out2 = _flags(spark, [(1, page)], terminal_punct=("!",),
                  min_sentences=4)[1]
    # 4 would require counting the '.' marks — the old bug's behavior
    assert out2["c4_min_sentences"] is False


def test_terminal_punct_none_counts_kept_lines(spark):
    page = "alpha beta gamma delta\nepsilon zeta eta theta"
    out = _flags(spark, [(1, page)], terminal_punct=None,
                 min_sentences=2)[1]
    assert out["c4_min_sentences"] is True
    assert out["c4_lines_kept"] == 2


def test_duckdb_flags_match_spark(spark):
    rows = [(i, t) for i, t in enumerate(
        [GOOD, *CASES.values(), "", "x.", "{", "many words here today."])]
    got = _flags(spark, rows, bad_words=("zzz",))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    d = D.DUCK
    stats = c4_stats_sql(d, "text", bad_words=("zzz",))
    flags = c4_flag_sqls(stats)
    cols = ", ".join(f"{sql} AS {name}" for name, sql in flags.items())
    for row in con.execute(
            f"SELECT doc_id, {cols} FROM documents ORDER BY doc_id"
            ).fetchall():
        doc_id, *vals = row
        for rule, v in zip(flags, vals):
            assert got[doc_id][f"c4_{rule}"] is bool(v), (doc_id, rule)


def test_cross_engine_fuzz_quotes_unicode_controls(spark):
    """Dialect-fuzz invariant for every C4 flag + the kept-line count on
    quote/unicode/control-heavy pages."""
    import random
    import string

    rng = random.Random(20260816)
    alphabet = (string.ascii_letters + " '\"\\;,.!?{}()\t\x0b"
                + "żółćüéñ中文🙂")
    pages = [(0, ""), (1, "'"), (2, '"'), (3, "{"), (4, "\n\n"),
             (5, 'he said "stop."'), (6, "🙂 emoji line ends here!")]
    i = len(pages)
    while i < 80:
        lines = []
        for _ in range(rng.randint(0, 6)):
            words = ["".join(rng.choice(alphabet)
                             for _ in range(rng.randint(1, 7)))
                     for _ in range(rng.randint(0, 8))]
            lines.append(" ".join(words)
                         + rng.choice([".", "!", "?", '"', "", " "]))
        pages.append((i, "\n".join(lines)))
        i += 1
    got = _flags(spark, pages, bad_words=("中文", "zzz"))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", pages)
    d = D.DUCK
    stats = c4_stats_sql(d, "text", bad_words=("中文", "zzz"))
    flags = c4_flag_sqls(stats)
    cols = ", ".join(f"{sql} AS {name}" for name, sql in flags.items())
    sql = (f"SELECT doc_id, {stats['n_kept_lines']} AS k, {cols} "
           f"FROM documents ORDER BY doc_id")
    for doc_id, k, *vals in con.execute(sql).fetchall():
        assert got[doc_id]["c4_lines_kept"] == k, \
            (doc_id, repr(dict(pages)[doc_id]))
        for rule, v in zip(flags, vals):
            assert got[doc_id][f"c4_{rule}"] is bool(v), \
                (doc_id, rule, repr(dict(pages)[doc_id]))


def test_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = c4_flags(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
