"""Gopher repetition rules (operators/repetition.py): an independent
pure-Python reference implementation cross-checked against the Spark plan
AND the DuckDB oracle CTEs on constructed + fuzz corpora, threshold
boundary cases, the composable filter, and plan-shape locks."""

from __future__ import annotations

import random
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from replibyte_spark import dialect as D
from replibyte_spark.operators import repetition as R

_WS = re.compile(r"[ \t\n\x0B\f\r]+")


# ---------------------------------------------------------------------------
# independent reference implementation (pure Python, no SQL reuse)
# ---------------------------------------------------------------------------

def ref_stats(text: str) -> dict:
    words = [t for t in _WS.split(text.lower().strip(" \t\n\x0B\f\r"))
             if t != ""]
    n_words = len(words)
    word_chars = sum(len(w) for w in words)
    out = {"n_words": n_words, "word_chars": word_chars}
    grams = {}
    for n in (*R.TOP_NS, *R.DUP_NS):
        grams[n] = [" ".join(words[i:i + n])
                    for i in range(n_words - n + 1)]
    for n in R.TOP_NS:
        counts = {}
        for g in grams[n]:
            counts[g] = counts.get(g, 0) + 1
        if not counts:
            out[f"top{n}_chars"] = 0
            continue
        mx = max(counts.values())
        g = max(k for k, v in counts.items() if v == mx)
        out[f"top{n}_chars"] = mx * len(g)
    for n in R.DUP_NS:
        counts = {}
        for g in grams[n]:
            counts[g] = counts.get(g, 0) + 1
        covered = set()
        for i, g in enumerate(grams[n]):
            if counts[g] > 1:
                covered.update(range(i, i + n))
        out[f"dup{n}_chars"] = sum(len(words[i]) for i in covered)
    return out


def ref_seg_flags(text: str, sep: str):
    segs = text.split(sep)
    n, nd = len(segs), len(set(segs))
    tc = sum(len(s) for s in segs)
    dc = sum(len(s) for s in set(segs))
    pf, qf = R.DUP_SEG_FRAC
    pc, qc = R.DUP_SEG_CHAR_FRAC
    return (qf * (n - nd) <= pf * n, qc * (tc - dc) <= pc * tc)


def ref_flags(text: str, line_sep="\n", para_sep="\n\n") -> dict:
    s = ref_stats(text)
    out = {}
    out["dup_line_frac"], out["dup_line_char_frac"] = \
        ref_seg_flags(text, line_sep)
    out["dup_para_frac"], out["dup_para_char_frac"] = \
        ref_seg_flags(text, para_sep)
    for n, (p, q) in R.TOP_NGRAM_CHAR_FRAC.items():
        out[f"top_{n}gram_char_frac"] = (
            s["n_words"] < n
            or q * s[f"top{n}_chars"]
            <= p * (s["word_chars"] + s["n_words"] - 1))
    for n, (p, q) in R.DUP_NGRAM_CHAR_FRAC.items():
        out[f"dup_{n}gram_char_frac"] = (
            s["n_words"] < n
            or q * s[f"dup{n}_chars"] <= p * s["word_chars"])
    return out


# ---------------------------------------------------------------------------
# fuzz corpus: repeated phrases, line dups, degenerate shapes
# ---------------------------------------------------------------------------

def _fuzz_docs(seed=7, n_docs=40):
    rng = random.Random(seed)
    vocab = ["the", "cat", "sat", "mat", "on", "a", "stream", "batch",
             "window", "join", "scan", "zz", "longishword"]
    docs = []
    for i in range(n_docs):
        shape = rng.randrange(5)
        if shape == 0:        # random words
            words = rng.choices(vocab, k=rng.randrange(0, 40))
            text = " ".join(words)
        elif shape == 1:      # repeated phrase
            phrase = " ".join(rng.choices(vocab, k=rng.randrange(2, 8)))
            text = " ".join([phrase] * rng.randrange(1, 5))
        elif shape == 2:      # duplicate lines
            lines = [" ".join(rng.choices(vocab, k=rng.randrange(1, 6)))
                     for _ in range(rng.randrange(1, 6))]
            lines += rng.choices(lines, k=rng.randrange(0, 4))
            text = "\n".join(lines)
        elif shape == 3:      # duplicate paragraphs
            paras = [" ".join(rng.choices(vocab, k=rng.randrange(1, 9)))
                     for _ in range(rng.randrange(1, 4))]
            paras += rng.choices(paras, k=rng.randrange(0, 3))
            text = "\n\n".join(paras)
        else:                 # whitespace noise
            text = "  ".join(rng.choices(vocab, k=rng.randrange(0, 10)))
            if rng.random() < 0.5:
                text = "\t" + text + "\n"
        docs.append((i, text))
    return docs


def test_spark_stats_match_reference(spark):
    docs = _fuzz_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in R.ngram_doc_stats(df).collect()}
    for i, text in docs:
        want = ref_stats(text)
        have = {k: got[i][k] for k in want}
        assert have == want, (i, repr(text), have, want)


def test_spark_flags_match_reference(spark):
    docs = _fuzz_docs(seed=11)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in R.repetition_flags(df).collect()}
    for i, text in docs:
        want = ref_flags(text)
        for rule, w in want.items():
            assert got[i]["rep_" + rule] is w, (i, rule, repr(text))
        assert got[i]["repetition_pass"] is all(want.values())


def test_duckdb_oracle_matches_reference():
    docs = _fuzz_docs(seed=23)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    sql = (f"WITH {R.ngram_stats_oracle_ctes().strip()} "
           f"SELECT * FROM rep_stats ORDER BY doc_id")
    cols = [c[0] for c in con.execute(sql).description]
    for row in con.execute(sql).fetchall():
        got = dict(zip(cols, row))
        want = ref_stats(dict(docs)[got["doc_id"]])
        have = {k: got[k] for k in want}
        assert have == want, (got["doc_id"], have, want)


# ---------------------------------------------------------------------------
# threshold boundaries (integer cross-multiplication exactness)
# ---------------------------------------------------------------------------

def _one_flag(spark, text, rule, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return R.repetition_flags(df, **kw).collect()[0]["rep_" + rule]


def test_dup_line_frac_boundary(spark):
    # 10 lines, 3 duplicates -> exactly 0.30: passes
    at = "\n".join(["u%d" % i for i in range(7)] + ["u0", "u1", "u2"])
    assert _one_flag(spark, at, "dup_line_frac") is True
    # 4 duplicates of 10 -> 0.40: fails
    over = "\n".join(["u%d" % i for i in range(6)]
                     + ["u0", "u1", "u2", "u3"])
    assert _one_flag(spark, over, "dup_line_frac") is False


def test_top_2gram_boundary(spark):
    # "ab ab ab ab ab": top 2-gram 'ab ab' cnt 4 x len 5 = 20 over
    # denom 10+4=14 -> way over 0.20: fails
    assert _one_flag(spark, "ab ab ab ab ab",
                     "top_2gram_char_frac") is False
    # all-distinct words: top 2-gram occurs once; with enough words the
    # single occurrence is under 20% of the normalized text
    uniq = " ".join("w%02d" % i for i in range(40))
    assert _one_flag(spark, uniq, "top_2gram_char_frac") is True


def test_dup_5gram_coverage_unions_overlaps(spark):
    # 'a b c d e f a b c d e f': the duplicated 5-grams 'a b c d e' and
    # 'b c d e f' overlap; union covers all 12 positions (12 chars) over
    # word_chars 12 -> 1.0 > 0.15: fails
    assert _one_flag(spark, "a b c d e f a b c d e f",
                     "dup_5gram_char_frac") is False
    # distinct words: no duplicated 5-gram at all: passes
    assert _one_flag(spark, " ".join("w%d" % i for i in range(12)),
                     "dup_5gram_char_frac") is True


def test_short_and_empty_docs_pass_vacuously(spark):
    for text in ("", "one", "one two three"):
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        row = R.repetition_flags(df).collect()[0]
        for n in R.DUP_NS:
            assert row[f"rep_dup_{n}gram_char_frac"] is True
    # but a 2-word doc DOES have a 2-gram and can fail the top-2 rule
    assert _one_flag(spark, "aa bb", "top_2gram_char_frac") is False


def test_repetition_filter_drops_and_keeps(spark):
    docs = [(1, " ".join("w%02d" % i for i in range(60))),  # clean
            (2, "spam spam spam spam spam spam spam spam")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    kept = R.repetition_filter(df)
    assert [r["doc_id"] for r in kept.collect()] == [1]
    assert kept.columns == ["doc_id", "text"]


def test_separator_parameterization(spark):
    # line rules at sep=' ' see word-level duplicates
    text = "tok tok tok tok unique1 unique2"
    assert _one_flag(spark, text, "dup_line_frac",
                     line_sep=" ") is False
    assert _one_flag(spark, text, "dup_line_frac") is True  # single line


def test_separator_with_single_quote(spark):
    """r11 ADVICE fix: a separator containing ' must produce a valid
    Spark split literal (re.escape leaves quotes alone — they need SQL
    doubling), and the segment semantics must hold."""
    text = "dup'dup'dup'dup'u1 u2 u3 u4 u5 u6"
    assert _one_flag(spark, text, "dup_line_frac", line_sep="'") is False
    assert _one_flag(spark, "a'b'c'd", "dup_line_frac",
                     line_sep="'") is True


def test_cross_engine_fuzz_quotes_unicode_controls(spark):
    """The dialect-fuzz invariant applied to every repetition flag: on a
    corpus mixing quotes, backslashes, unicode (incl. non-BMP), control
    whitespace and repeated phrases, the Spark flags and the DuckDB
    oracle CTE stats must agree bit-exactly."""
    import string

    rng = random.Random(20260815)
    alphabet = (string.ascii_letters + " '\"\\;,.()\n\t\x0b"
                + "żółćüéñ中文🙂")
    docs = [(0, ""), (1, "'"), (2, "\\"), (3, "\n\n\n"), (4, "\x0b"),
            (5, '"" "" "" "" ""'), (6, "🙂 🙂 🙂 🙂 🙂 🙂"),
            (7, "中文 字 中文 字 中文 字")]
    i = len(docs)
    while i < 80:
        words = ["".join(rng.choice(alphabet)
                         for _ in range(rng.randint(1, 8)))
                 for _ in range(rng.randint(0, 15))]
        if rng.random() < 0.4 and words:
            words = words + words  # force repetition
        docs.append((i, " ".join(words)))
        i += 1
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in R.ngram_doc_stats(df).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    sql = (f"WITH {R.ngram_stats_oracle_ctes().strip()} "
           f"SELECT * FROM rep_stats ORDER BY doc_id")
    cols = [c[0] for c in con.execute(sql).description]
    for row in con.execute(sql).fetchall():
        want = dict(zip(cols, row))
        have = got[want["doc_id"]]
        for k in cols:
            assert have[k] == want[k], \
                (want["doc_id"], k, have[k], want[k],
                 repr(dict(docs)[want["doc_id"]]))


def test_plan_has_no_nested_loop_or_cartesian(spark):
    docs = _fuzz_docs(seed=3, n_docs=8)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    plan = R.repetition_flags(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
