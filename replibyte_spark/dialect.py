"""Cross-dialect SQL expression builder (Spark SQL + DuckDB).

Every deterministic scalar computed by this engine (fake-data transformers,
text metrics, hashes, minhash signatures, ...) is generated ONCE as SQL text in
a tiny common dialect, then compiled for either engine.  The Spark rendering
becomes the real plan (``F.expr``); the DuckDB rendering becomes the oracle
query the driver checks against.  Because both renderings come from the same
builder, the engine and its oracle cannot drift.

Reference analogue: Replibyte's transformers are row-at-a-time Rust closures
with *unseeded* RNG (/root/reference/replibyte/src/transformer/random.rs:57-83,
email.rs:58-70) — untestable by construction.  Here every "random" value is a
pure function of (input value, salt) derived from md5, so results are stable
across partitions, retries and engines, and stay inside whole-stage codegen
(no Python in the hot path).

Only the functions whose names differ between the two dialects go through
shims; everything else (md5, substr, translate, repeat, length, CASE, ``||``,
arithmetic) is portable SQL text shared verbatim.
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duckdb"


def q(s: str) -> str:
    """SQL single-quoted string literal."""
    return "'" + s.replace("'", "''") + "'"


# ---------------------------------------------------------------------------
# dialect shims
# ---------------------------------------------------------------------------

def to_str(d: str, e: str) -> str:
    return f"CAST({e} AS STRING)" if d == SPARK else f"CAST({e} AS VARCHAR)"


def to_long(d: str, e: str) -> str:
    return f"CAST({e} AS BIGINT)"


def to_double(d: str, e: str) -> str:
    return f"CAST({e} AS DOUBLE)"


def dlit(d: str, x: float) -> str:
    """Exact DOUBLE literal.  Spark: the `D` suffix.  DuckDB: an explicit
    exponent (`e0` appended when repr has none) — a BARE decimal literal
    parses as DECIMAL first, and DECIMAL→DOUBLE conversion is off by one
    ulp from strtod for ~17-significant-digit values (measured:
    1.1695611615388475 arrives as ...477), silently diverging any oracle
    that inlines collected doubles."""
    s = repr(float(x))
    if d == SPARK:
        return f"{s}D"
    return s if ("e" in s or "E" in s or "inf" in s or "nan" in s) \
        else s + "e0"


def to_int(d: str, e: str) -> str:
    return f"CAST({e} AS INT)" if d == SPARK else f"CAST({e} AS INTEGER)"


def array_len(d: str, e: str) -> str:
    return f"size({e})" if d == SPARK else f"len({e})"


def split_ws(d: str, e: str) -> str:
    """Split on runs of whitespace (leading/trailing trimmed first).

    Trimming is a REGEX strip of all whitespace classes, not trim():
    both engines' trim() removes only the space character (0x20), so a
    text starting with a newline/tab would split into an empty leading
    token — inflating token counts and shifting every chunk offset on
    real corpora (measured identical in Spark and DuckDB, so oracle
    parity could never catch it)."""
    # EXPLICIT class, not \s: Java regex \s includes vertical tab
    # U+000B, RE2's does not — the one whitespace char the engines
    # disagree on.  Same class in trim and split, same chars both
    # dialects.
    cs = "[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]"   # Spark SQL string: '\\t' -> regex \t
    cd = "[ \\t\\n\\x0B\\f\\r]"          # DuckDB strings keep backslashes
    if d == SPARK:
        return (f"split(regexp_replace({e}, '^{cs}+|{cs}+$', ''), "
                f"'{cs}+')")
    return (f"regexp_split_to_array("
            f"regexp_replace({e}, '^{cd}+|{cd}+$', '', 'g'), '{cd}+')")


def regexp_replace(d: str, e: str, pattern: str, repl: str) -> str:
    if d == SPARK:
        pat = pattern.replace("\\", "\\\\")
        return f"regexp_replace({e}, '{pat}', {q(repl)})"
    return f"regexp_replace({e}, '{pattern}', {q(repl)}, 'g')"


def array_filter(d: str, arr: str, lam: str) -> str:
    """lam uses variable name x, e.g. 'x -> length(x) > 2'."""
    return f"filter({arr}, {lam})" if d == SPARK else f"list_filter({arr}, {lam})"


def array_contains_lit(d: str, items: list[str], e: str) -> str:
    lits = ", ".join(q(i) for i in items)
    if d == SPARK:
        return f"array_contains(array({lits}), {e})"
    return f"list_contains([{lits}], {e})"


def int_div(d: str, a: str, b: str) -> str:
    """Integer division for NON-NEGATIVE integer operands (Spark `div`
    truncates toward zero, DuckDB `//` floors — identical on >= 0, the
    only domain the millionths-score convention uses)."""
    return f"(({a}) div ({b}))" if d == SPARK else f"(({a}) // ({b}))"


def pick_from_list(d: str, items: list[str], idx_expr: str) -> str:
    """1-based index into a literal string list."""
    lits = ", ".join(q(i) for i in items)
    if d == SPARK:
        return f"element_at(array({lits}), {to_int(d, idx_expr)})"
    return f"list_extract([{lits}], {to_int(d, idx_expr)})"


def date_add_days(d: str, date_lit: str, days_expr: str) -> str:
    if d == SPARK:
        return f"date_add(DATE {q(date_lit)}, {to_int(d, days_expr)})"
    return f"CAST(DATE {q(date_lit)} + {to_int(d, days_expr)} * INTERVAL 1 DAY AS DATE)"


# ---------------------------------------------------------------------------
# deterministic pseudo-randomness (pure function of value + salt)
# ---------------------------------------------------------------------------

def md5_hex(d: str, e: str, salt: str) -> str:
    """md5 hex digest of (salt || value-as-string); NULL-safe via coalesce."""
    payload = f"coalesce({to_str(d, e)}, '')"
    return f"md5(concat({q(salt)}, {payload}))"


def hash_digits(d: str, e: str, salt: str, start: int, n: int) -> str:
    """n pseudo-random decimal digits (as a string) derived from the value.

    Hex chars a-f are translated to digits 1-6; 0-9 pass through.  Identical
    text in both dialects, stays in codegen, no UDF.
    """
    assert 1 <= start and start + n - 1 <= 32
    return f"translate(substr({md5_hex(d, e, salt)}, {start}, {n}), 'abcdef', '123456')"


def hash_long(d: str, e: str, salt: str, start: int = 1, n: int = 15) -> str:
    """Non-negative bigint derived from the value (n decimal digits, n<=18)."""
    return to_long(d, hash_digits(d, e, salt, start, n))


def hash_mod(d: str, e: str, salt: str, m: int, start: int = 1) -> str:
    """Pseudo-random value in [0, m).

    NOTE: built on `hash_digits`' a-f→1-6 translate, so digits 1-6 are twice
    as likely — fine for fake-data generation, NOT for rate-accurate
    sampling.  Use :func:`hash_uniform_mod` when the modulus distribution
    must be uniform.
    """
    return f"({hash_long(d, e, salt, start, 12)} % {m})"


def hash_uniform_long(d: str, e: str, salt: str) -> str:
    """UNIFORM non-negative bigint (48 bits) from the first 12 md5 hex chars.

    The hex prefix is interpreted as a base-16 integer — every hex char
    contributes 4 unbiased bits, unlike the `translate` digit trick whose
    1-6 digits are twice as likely.  Spark renders `conv(hex, 16, 10)`
    (one md5 evaluation); DuckDB has no conv(), so the oracle renders the
    equivalent positional polynomial — both compute the same value.
    """
    h = md5_hex(d, e, salt)
    if d == SPARK:
        return f"CAST(conv(substr({h}, 1, 12), 16, 10) AS BIGINT)"
    terms = " + ".join(
        f"(instr('0123456789abcdef', substr({h}, {k}, 1)) - 1) * {16 ** (12 - k)}"
        for k in range(1, 13)
    )
    return f"({terms})"


def hash_uniform_mod(d: str, e: str, salt: str, m: int) -> str:
    """Uniform pseudo-random value in [0, m) (bias ≤ m/2^48)."""
    return f"({hash_uniform_long(d, e, salt)} % {m})"
