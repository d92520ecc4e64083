"""Free-text PII scrubbing — the reference anonymizes STRUCTURED columns
(transformer/email.rs, phone_number.rs, credit_card.rs operate on a typed
cell); a training-data pipeline also needs the UNSTRUCTURED variant:
find and redact identifiers embedded inside document text before the
corpus ships.  Pure SQL regexp_replace chains (JVM-side, whole-stage
codegen — no Python in the hot path), built per dialect so the DuckDB
oracle applies the exact same rules.

Pattern notes (cross-engine: Java regex on Spark, RE2 on DuckDB — only
the common subset is used: classes, bounded repeats, alternation,
non-capturing groups, \\b):

- Order matters and is part of the contract: emails first (their
  local/domain parts contain dots and digits that later rules would
  shred), SSN before phone (both dash-digit shapes), card groups before
  phone (a 16-digit card must not be half-eaten as a phone number), bare
  IPv4 last (after emails, any dotted quad left is an address).
- Deliberately recall-biased, like every production scrubber: a dotted
  version string "1.2.3.4" will redact as <IP>.  At 100 TB you audit the
  redaction RATE per source (see pii_profile in the workload), not each
  hit.
"""

from __future__ import annotations

from .. import dialect as D

# (category, pattern, replacement token) — applied strictly in order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ssn",
     r"\b\d{3}-\d{2}-\d{4}\b",
     "<SSN>"),
    ("credit_card",
     r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b|\b\d{15,16}\b",
     "<CC>"),
    ("phone",
     r"\b\d{3}[- .]\d{3}[- .]\d{4}\b",
     "<PHONE>"),
    ("ipv4",
     r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
     "<IP>"),
]


def scrub_pii_sql(d: str, e: str) -> str:
    """One nested regexp_replace chain redacting every category in
    PII_PATTERNS order.  NULL text stays NULL (regexp_replace is
    NULL-propagating in both engines)."""
    out = e
    for _name, pat, repl in PII_PATTERNS:
        out = D.regexp_replace(d, out, pat, repl)
    return out


def pii_count_sql(d: str, e: str, category: str) -> str:
    """Match count for one category over the ORIGINAL text (counts are
    computed before scrubbing; an email hit also contains digits the
    phone rule would never see after redaction)."""
    pat = dict((n, p) for n, p, _ in PII_PATTERNS)[category]
    if d == D.SPARK:
        esc = pat.replace("\\", "\\\\")
        # explicit NULL case: Spark's legacy sizeOfNull returns -1, not
        # NULL, for size(NULL) — the oracle (DuckDB length) is NULL
        return (f"CAST(CASE WHEN {e} IS NULL THEN NULL ELSE "
                f"size(regexp_extract_all({e}, '{esc}', 0)) END AS BIGINT)")
    return f"CAST(length(regexp_extract_all({e}, '{pat}')) AS BIGINT)"


def scrub_pii(df, *cols: str):
    """DataFrame helper: redact every PII category in the given string
    columns (defaults to 'text').  One projection, no shuffle — the scrub
    is a per-row expression and composes with any downstream plan.

    r13 fan_out sweep: the scrub is a stack of regexp_replace passes per
    column — exactly the heavy zero-shuffle projection shape that
    serializes on a one-split scan (the r12 repetition/gopher/C4/LID
    trap).  fan_out is a no-op on already-wide or streaming frames."""
    from pyspark.sql import functions as F

    from ..util import fan_out

    df = fan_out(df)
    for c in (cols or ("text",)):
        df = df.withColumn(c, F.expr(scrub_pii_sql(D.SPARK, c)))
    return df
