"""Batch fuzz of THE core invariant: for arbitrary strings, every
transformer's Spark rendering and DuckDB rendering produce identical values.
One DataFrame round-trip for all cases (per-example Spark jobs would be
minutes); the corpus mixes quotes, unicode, controls, long strings."""

from __future__ import annotations

import random
import string

import duckdb
import pytest

from replibyte_spark import dialect as D
from replibyte_spark.functions import transformers as T

rng = random.Random(20260813)
ALPHABET = (string.ascii_letters + string.digits + " '\"\\;,.()%$_-\n\t"
            + "żółćüéñ中文🙂")
CORPUS = [""] + ["'"] + ["\\"] + ["a"] + [
    "".join(rng.choice(ALPHABET) for _ in range(rng.randint(1, 60)))
    for _ in range(300)
]

STRING_TRANSFORMERS = ["email", "first-name", "phone-number", "credit-card",
                       "random", "keep-first-char", "redacted", "transient",
                       "random-date"]


@pytest.mark.parametrize("name", STRING_TRANSFORMERS)
def test_fuzz_cross_dialect(spark, name):
    fn = T.TRANSFORMERS[name]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(CORPUS)],
                               "i long, v string")
    got = {r.i: r.out for r in
           df.selectExpr("i", f"{fn(D.SPARK, 'v')} AS out").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, v) for i, v in enumerate(CORPUS)])
    want = dict(con.execute(f"SELECT i, {fn(D.DUCK, 'v')} FROM t").fetchall())
    bad = {i: (got[i], want[i], CORPUS[i]) for i in got if got[i] != want[i]}
    assert not bad, f"{name}: {len(bad)} divergent values, first: {next(iter(bad.items()))}"
