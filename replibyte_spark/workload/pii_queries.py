"""Gate queries for free-text PII scrubbing (functions/pii.py).

The fixture tables carry no embedded PII, so the gate SYNTHESIZES it
deterministically from customer columns with the same cross-dialect SQL
on both engines — emails, phones, SSNs, card numbers and IPs derived
from c_custkey/c_name — then scrubs and counts.  Both sides compute the
identical construction, so the comparison exercises the full regex
chain, not a trivially-empty corpus.

Reference tie-in: this is the unstructured-text sibling of T1/T3/T4
(transformer/email.rs, phone_number.rs, credit_card.rs) — same
anonymization contract, applied inside document bodies instead of typed
cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import dialect as D
from ..catalog import load_table
from ..functions.pii import PII_PATTERNS, pii_count_sql, scrub_pii_sql
from ..util import fan_out
from . import Query, register


def _pii_text_sql(d: str) -> str:
    """Deterministic PII-laden prose from customer columns — identical
    string in both engines (concat/lower/replace/lpad only)."""
    key = "c_custkey"
    pad4 = f"lpad({D.to_str(d, f'{key} % 10000')}, 4, '0')"
    pad3 = f"lpad({D.to_str(d, f'{key} % 1000')}, 3, '0')"
    pad2 = f"lpad({D.to_str(d, f'{key} % 100')}, 2, '0')"
    oct3 = D.to_str(d, f"{key} % 200")
    oct4 = D.to_str(d, f"{key} % 250")
    local = "lower(replace(c_name, '#', '_'))"
    return (
        f"concat('account note for ', c_name, ': reach ', {local}, "
        f"'@example.com or 555-123-', {pad4}, "
        f"', ssn ', {pad3}, '-', {pad2}, '-', {pad4}, "
        f"', card 4111 1111 1111 ', {pad4}, "
        f"', last login 10.', {oct3}, '.0.', {oct4})"
    )


def pii_scrub_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrubbed synthetic notes + per-category hit counts (counted on the
    ORIGINAL text).  Single projection per row — no shuffle, no UDF; at
    100 TB this runs at scan speed inside whole-stage codegen."""
    d = D.SPARK
    cust = fan_out(load_table(spark, sf_dir, "customer"))
    noted = cust.selectExpr("c_custkey", f"{_pii_text_sql(d)} AS note")
    return (noted.selectExpr(
        "c_custkey",
        f"{scrub_pii_sql(d, 'note')} AS scrubbed",
        *[f"{pii_count_sql(d, 'note', cat)} AS n_{cat}"
          for cat, _, _ in PII_PATTERNS])
        .orderBy("c_custkey"))


def _scrub_oracle() -> str:
    d = D.DUCK
    counts = ",\n       ".join(
        f"{pii_count_sql(d, 'note', cat)} AS n_{cat}"
        for cat, _, _ in PII_PATTERNS)
    return f"""
WITH noted AS (
  SELECT c_custkey, {_pii_text_sql(d)} AS note FROM customer
)
SELECT c_custkey,
       {scrub_pii_sql(d, 'note')} AS scrubbed,
       {counts}
FROM noted ORDER BY c_custkey
"""


def pii_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment redaction audit — the number you actually review at
    100 TB (per-source HIT RATES, not individual redactions): one
    aggregation over the same synthetic notes."""
    d = D.SPARK
    cust = fan_out(load_table(spark, sf_dir, "customer"))
    noted = cust.selectExpr("c_mktsegment", f"{_pii_text_sql(d)} AS note")
    aggs = [F.sum(F.expr(pii_count_sql(d, "note", cat)))
            .cast("long").alias(f"n_{cat}")
            for cat, _, _ in PII_PATTERNS]
    return (noted.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
            .orderBy("c_mktsegment"))


def _profile_oracle() -> str:
    d = D.DUCK
    sums = ",\n       ".join(
        f"CAST(sum({pii_count_sql(d, 'note', cat)}) AS BIGINT) AS n_{cat}"
        for cat, _, _ in PII_PATTERNS)
    return f"""
WITH noted AS (
  SELECT c_mktsegment, {_pii_text_sql(d)} AS note FROM customer
)
SELECT c_mktsegment, count(*) AS n_rows,
       {sums}
FROM noted GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


register(Query("pii_scrub_customers", pii_scrub_customers, _scrub_oracle(),
               tags=("text", "pii")), extra=True)
register(Query("pii_profile", pii_profile, _profile_oracle(),
               tags=("text", "pii")), extra=True)
