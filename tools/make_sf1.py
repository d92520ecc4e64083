#!/usr/bin/env python
"""Deterministic sf1.0 probe fixture: amplify the driver's sf0.1 fixture
10x so the SCALE.md probe table gains a second decade (sf0.01 -> sf0.1 ->
sf1.0) for the worst 10x scalers (r13 verdict task #5).

The driver provides no sf1 fixture and TESTDATA.md pins /root/testdata as
read-only, so this writes a SIBLING directory (never inside /root/testdata)
that mirrors the driver generator's scaling shape:

- fact tables x10 with per-replica key shifts that preserve FK validity
  and PER-ENTITY distributions (each replica's orders reference that
  replica's customers, so rows-per-customer and lines-per-order match the
  base fixture exactly — amplification multiplies entity count, not
  entity size);
- documents x10 with shifted doc_id and IDENTICAL text: per-row projection
  probes (repetition rules, LID, quality) see the same per-row work
  distribution at 10x the rows.  Dedup-family queries are NOT probed on
  this fixture — replica texts are exact duplicates, which would measure
  a deliberately degenerate near-dup explosion, not the operator's
  scaling (their slope argument stays on the driver-provided 10x step);
- embeddings x4 (the driver's own sf0.01 -> sf0.1 progression: 500 ->
  2000) with shifted vec_id and identical vectors — ANN probes time
  bucket/probe traversal, which identical vectors exercise faithfully;
- dimensions (region, nation, part, supplier) copied as-is.

Pure DuckDB (no Spark), fully deterministic (replica index arithmetic,
no RNG), single-file-per-table layout matching the driver's.

Usage: python tools/make_sf1.py [OUT_DIR]   (default /root/sf1_probe)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1_probe"

COPY_TABLES = ("region", "nation", "part", "supplier")


def main() -> None:
    assert not os.path.abspath(OUT).startswith("/root/testdata"), \
        "refusing to write inside the read-only driver fixture tree"
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(table: str, sql: str) -> None:
        path = f"{OUT}/{table}.parquet"
        con.execute(f"COPY ({sql}) TO '{path}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{path}'").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in COPY_TABLES:
        write(t, f"SELECT * FROM {src(t)}")

    # key strides: one past the base table's max key, so replica k's keys
    # occupy a disjoint block and FK arithmetic is a single addition
    stride = {}
    for t, k in (("customer", "c_custkey"), ("orders", "o_orderkey"),
                 ("events", "event_id"), ("events2", "user_id"),
                 ("documents", "doc_id"), ("embeddings", "vec_id")):
        src_t = "events" if t == "events2" else t
        stride[k] = con.execute(
            f"SELECT max({k}) + 1 FROM {src(src_t)}").fetchone()[0]

    rep10 = "(SELECT unnest(range(10)) AS k)"
    rep4 = "(SELECT unnest(range(4)) AS k)"
    write("customer", f"""
        SELECT c_custkey + k * {stride['c_custkey']} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM {src('customer')}, {rep10}""")
    write("orders", f"""
        SELECT o_orderkey + k * {stride['o_orderkey']} AS o_orderkey,
               o_custkey + k * {stride['c_custkey']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}, {rep10}""")
    write("lineitem", f"""
        SELECT l_orderkey + k * {stride['o_orderkey']} AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag,
               l_linestatus, l_shipdate
        FROM {src('lineitem')}, {rep10}""")
    write("events", f"""
        SELECT event_id + k * {stride['event_id']} AS event_id,
               ts, user_id + k * {stride['user_id']} AS user_id,
               event_type, value, props
        FROM {src('events')}, {rep10}""")
    write("documents", f"""
        SELECT doc_id + k * {stride['doc_id']} AS doc_id,
               text, lang, source, n_chars
        FROM {src('documents')}, {rep10}""")
    write("embeddings", f"""
        SELECT vec_id + k * {stride['vec_id']} AS vec_id, embedding, label
        FROM {src('embeddings')}, {rep4}""")
    print(f"fixture at {OUT}")


if __name__ == "__main__":
    main()
