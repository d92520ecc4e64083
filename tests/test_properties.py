"""Property-based tests (hypothesis) — beyond the reference's example-based
suite (SURVEY.md §5): the SQL-text round-trip and transformer invariants must
hold for arbitrary adversarial strings, not just fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from replibyte_spark.sources.sqldump import _decode_value, parse_insert, split_statements

# printable-ish text incl. quotes, semicolons, newlines, unicode
adversarial = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), min_codepoint=1),
    max_size=80,
)


def _encode_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


@given(adversarial, st.integers(-(2**62), 2**62), st.booleans())
@settings(max_examples=200, deadline=None)
def test_insert_roundtrip_arbitrary_strings(s, n, b):
    """encode → split → parse returns the exact original values (reference
    to_query/parse pair, source/postgres.rs:499-546 + 375-412)."""
    stmt = (f"INSERT INTO t (a, b, c, d) VALUES "
            f"({_encode_value(s)}, {_encode_value(n)}, {_encode_value(b)}, NULL);")
    stmts = list(split_statements(stmt))
    assert len(stmts) == 1
    parsed = parse_insert(stmts[0])
    assert parsed is not None
    _t, cols, vals = parsed
    assert vals[0] == s, f"string mangled: {s!r} -> {vals[0]!r}"
    assert vals[1] == n
    assert vals[2] is b
    assert vals[3] is None


@given(st.lists(adversarial, min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_splitter_statement_count(texts):
    """N well-formed statements in, exactly N statements out, regardless of
    embedded `;`, quotes or newlines in the literals."""
    src = "".join(
        f"INSERT INTO t (a) VALUES ({_encode_value(s)});" for s in texts)
    assert len(list(split_statements(src))) == len(texts)


@given(st.text(max_size=30))
@settings(max_examples=100, deadline=None)
def test_decode_value_never_raises_on_quoted(s):
    tok = "'" + s.replace("'", "''") + "'"
    assert _decode_value(tok) == s


# --- streaming archive writer --------------------------------------------

_doc_values = st.recursive(
    st.one_of(st.integers(-(2**31), 2**31 - 1), st.text(max_size=20),
              st.floats(allow_nan=False, allow_infinity=False),
              st.booleans(), st.none()),
    lambda inner: st.dictionaries(
        st.text(min_size=1, max_size=8).filter(lambda s: "\x00" not in s),
        inner, max_size=3),
    max_leaves=6)

_collections = st.dictionaries(
    st.text(st.characters(min_codepoint=97, max_codepoint=122),
            min_size=1, max_size=8),
    st.lists(st.dictionaries(
        st.text(min_size=1, max_size=6).filter(lambda s: "\x00" not in s),
        _doc_values, max_size=4), max_size=6),
    min_size=1, max_size=3)


@given(_collections)
@settings(max_examples=50, deadline=None)
def test_archive_stream_writer_matches_in_memory_builder(colls):
    """write_archive_stream (iterator in, incremental CRC) is byte-for-byte
    build_archive_raw for ARBITRARY BSON-encodable document sets, and the
    result parses back with verified CRCs."""
    import os
    import tempfile

    from replibyte_spark.sources.mongo_archive import (
        build_archive_raw, encode_document, parse_archive,
        write_archive_stream)

    raw = {c: [encode_document(d) for d in docs] for c, docs in colls.items()}
    ref = build_archive_raw(raw, db="propdb")
    fd, path = tempfile.mkstemp()
    os.close(fd)
    try:
        n = write_archive_stream(path, {c: iter(b) for c, b in raw.items()},
                                 db="propdb")
        with open(path, "rb") as fh:
            got = fh.read()
    finally:
        os.unlink(path)
    assert n == sum(len(b) for b in raw.values())
    assert got == ref
    parsed = parse_archive(got)  # raises on any CRC mismatch
    assert sum(len(v) for v in parsed.collections().values()) == n
