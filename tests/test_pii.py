"""Free-text PII scrubbing (functions/pii.py): cross-engine agreement on
adversarial inputs, category ordering, and the DataFrame helper."""

from __future__ import annotations

import random

import pytest

from replibyte_spark import dialect as D
from replibyte_spark.functions.pii import (
    PII_PATTERNS,
    pii_count_sql,
    scrub_pii,
    scrub_pii_sql,
)

HANDCRAFTED = [
    "mail me at john.doe+x@ex-ample.co.uk thanks",
    "card 4111 1111 1111 1111 exp 11/26",
    "card run 4111 1111 1111 1111 2222 overflow",
    "call 555-123-4567 or 555.123.4567",
    "ssn 123-45-6789 ip 10.0.0.1",
    "version 1.2.3.4 release",            # recall-biased: redacts as <IP>
    "date 2024-01-01 is not an ssn",
    "plain text no pii 12345",
    "20 digits 12345678901234567890 no boundary match",
    "bare 4242424242424242 pan",
    "a@b.io 999-88-7777 4242424242424242 212-555-0198 8.8.8.8",
    "ext 555-123-4567-8901 keeps the tail",
    "1111@example.com is an email before it is a card",
    "",
    None,
]


def _fuzz_samples(n: int = 300, seed: int = 7) -> list:
    """Deterministic digit/dot/at-heavy strings that stress every
    pattern boundary."""
    rng = random.Random(seed)
    frags = ["555", "4111", "123", "45", "6789", "10", "0", "1", "a", "x",
             "example", "com", "io", "%", "+", "_"]
    seps = ["-", ".", " ", "", "@"]
    out = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randrange(1, 12)):
            parts.append(rng.choice(frags))
            parts.append(rng.choice(seps))
        out.append("".join(parts))
    return out


def test_scrub_and_counts_agree_across_engines(spark, duck):
    """Spark's regexp chain and the DuckDB oracle rendering must produce
    byte-identical scrubs and identical per-category counts on inputs
    chosen to sit on every pattern boundary (word boundaries, alternation
    overlap, NULL, empty)."""
    samples = HANDCRAFTED + _fuzz_samples()
    df = spark.createDataFrame(list(enumerate(samples)), "i int, t string")
    cols = [f"{scrub_pii_sql(D.SPARK, 't')} AS s"] + [
        f"{pii_count_sql(D.SPARK, 't', cat)} AS n_{cat}"
        for cat, _, _ in PII_PATTERNS]
    got = {r["i"]: tuple(r)[1:]
           for r in df.selectExpr("i", *cols).collect()}
    dexpr = ", ".join(
        [f"{scrub_pii_sql(D.DUCK, 't')}"]
        + [pii_count_sql(D.DUCK, "t", cat) for cat, _, _ in PII_PATTERNS])
    for i, s in enumerate(samples):
        want = tuple(duck.execute(
            f"SELECT {dexpr} FROM (SELECT ?::VARCHAR AS t)", [s]).fetchone())
        assert got[i] == want, (i, s, got[i], want)


def test_scrub_examples_and_ordering(spark):
    """Pinned behavior: email beats card for digit@domain, card groups are
    not half-eaten as phones, versions redact as IPs (recall-biased by
    design), and dates/plain digit runs survive."""
    rows = spark.createDataFrame(
        [(i, s) for i, s in enumerate(HANDCRAFTED) if s], "i int, t string")
    out = {r.i: r.s for r in rows.selectExpr(
        "i", f"{scrub_pii_sql(D.SPARK, 't')} AS s").collect()}
    assert out[0] == "mail me at <EMAIL> thanks"
    assert out[1] == "card <CC> exp 11/26"
    assert out[2] == "card run <CC> 2222 overflow"
    assert out[3] == "call <PHONE> or <PHONE>"
    assert out[4] == "ssn <SSN> ip <IP>"
    assert out[5] == "version <IP> release"
    assert out[6] == "date 2024-01-01 is not an ssn"
    assert out[7] == "plain text no pii 12345"
    assert out[8] == "20 digits 12345678901234567890 no boundary match"
    assert out[9] == "bare <CC> pan"
    assert out[10] == "<EMAIL> <SSN> <CC> <PHONE> <IP>"
    assert out[11] == "ext <PHONE>-8901 keeps the tail"
    assert out[12] == "<EMAIL> is an email before it is a card"
    # nothing PII-shaped survives a scrub of these samples
    leftover = rows.selectExpr(
        f"{scrub_pii_sql(D.SPARK, 't')} AS s").selectExpr(
        *[f"{pii_count_sql(D.SPARK, 's', cat)} AS n_{cat}"
          for cat, _, _ in PII_PATTERNS]).collect()
    assert all(v == 0 for r in leftover for v in tuple(r))


def test_scrub_pii_dataframe_helper(spark):
    df = spark.createDataFrame(
        [(1, "a@b.io", "ip 8.8.8.8"), (2, "clean", "also clean")],
        "id int, a string, b string")
    out = {r.id: (r.a, r.b) for r in scrub_pii(df, "a", "b").collect()}
    assert out[1] == ("<EMAIL>", "ip <IP>")
    assert out[2] == ("clean", "also clean")
    # default column name
    d2 = spark.createDataFrame([(1, "x@y.zz")], "id int, text string")
    assert scrub_pii(d2).collect()[0].text == "<EMAIL>"


def test_scrub_plan_stays_in_codegen(spark, sf_dir):
    """The scrub is one projection: no DATA shuffle, no Python UDF — at
    scale it must run at scan speed inside WholeStageCodegen.  r13: the
    regex stack widens a narrow scan first (the flag-operator
    convention), so exactly one RoundRobin exchange is allowed and ZERO
    hashpartitioning (a key shuffle would mean someone broke the
    pure-projection contract)."""
    from replibyte_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    df = scrub_pii(docs)
    df.collect()  # AQE finalizes the plan (codegen spans print post-run)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the adaptive string repeats the plan under '== Initial Plan ==';
    # assert on the executed (final) section only
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Exchange") <= 1
    assert "hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the Project runs inside a WholeStageCodegen span ('*(n)' prefix)
    assert "*(2) Project" in plan or "*(1) Project" in plan
