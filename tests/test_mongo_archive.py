"""mongodump --archive parser tests.

Golden fixture: the reference's own test archive (a hexdump embedded in
/root/reference/dump-parser/src/mongodb/mod.rs — db `test2`, collection
`Users`, one document {name: "John", age: 42}); we assert the same
structure its test asserts, plus byte-identical re-serialization and CRC
verification the reference does not do on read.
"""

from __future__ import annotations

import re

import pytest

from replibyte_spark.sources.mongo_archive import (
    Binary, Crc64Xz, Int64, ObjectId, UTCDatetime, build_archive,
    build_archive_raw, crc64_xz, decode_document, doc_to_json,
    encode_document, parse_archive, read_mongo_archive, serialize_archive,
    write_archive_stream,
)


def _golden_bytes() -> bytes:
    src = open("/root/reference/dump-parser/src/mongodb/mod.rs").read()
    m = re.search(r'let dump_str = "([0-9a-f]+)"', src)
    return bytes.fromhex(m.group(1))


def test_crc64_xz_known_vector():
    # CRC-64/XZ check value for "123456789" (ECMA-182 reflected)
    assert crc64_xz(b"123456789") == 0x995DC9BBDF1939FA


def test_incremental_crc_matches_one_shot():
    data = bytes(range(256)) * 7
    inc = Crc64Xz()
    for i in range(0, len(data), 13):          # odd chunk size on purpose
        inc.update(data[i:i + 13])
    assert inc.digest() == crc64_xz(data)


def test_write_archive_stream_byte_identical(tmp_path):
    """The streaming writer (iterator in, incremental CRC, bounded driver
    memory) must produce the exact bytes build_archive_raw assembles
    in-memory — including the empty-collection footer."""
    docs_a = [encode_document({"_id": i, "v": "x" * i}) for i in range(40)]
    docs_b = [encode_document({"_id": i}) for i in range(3)]
    colls = {"aa": docs_a, "bb": docs_b, "empty": []}
    ref = build_archive_raw(colls, db="tpch")
    out = tmp_path / "stream.archive"
    n = write_archive_stream(str(out), {c: iter(d) for c, d in colls.items()},
                             db="tpch")
    assert n == 43
    got = out.read_bytes()
    assert got == ref
    parsed = parse_archive(got)                # CRC verify on read
    assert sum(len(v) for v in parsed.collections().values()) == 43


def test_bson_roundtrip_all_types():
    doc = {
        "_id": ObjectId(bytes(range(12))),
        "name": "Zoë",
        "age": 42,
        "big": Int64(7),
        "huge": 1 << 40,
        "pi": 3.25,
        "ok": True,
        "none": None,
        "when": UTCDatetime(1700000000000),
        "blob": Binary(0, b"\x00\x01\xff"),
        "nested": {"a": 1, "b": [1, "two", {"c": False}]},
    }
    raw = encode_document(doc)
    back, end = decode_document(raw)
    assert end == len(raw)
    assert back == doc
    assert encode_document(back) == raw  # byte-stable
    # width preserved: int64-marked small value stays 0x12
    assert b"\x12big\x00" in raw and b"\x10age\x00" in raw


def test_reference_golden_archive_parses():
    buf = _golden_bytes()
    arch = parse_archive(buf)  # CRC verification on
    hdr = arch.header
    assert hdr["concurrent_collections"] == 4 or hdr["concurrent_collections"] >= 1
    cols = arch.collections()
    assert list(cols) == [("test2", "Users")]
    docs = [decode_document(r)[0] for r in cols[("test2", "Users")]]
    assert len(docs) == 1
    assert docs[0]["name"] == "John" and docs[0]["age"] == 42
    assert isinstance(docs[0]["_id"], ObjectId)


def test_reference_golden_archive_reserializes_byte_identical():
    buf = _golden_bytes()
    assert serialize_archive(parse_archive(buf)) == buf


def test_corrupted_crc_raises():
    buf = bytearray(_golden_bytes())
    # flip one byte inside the document payload ("John" → "Kohn")
    i = buf.index(b"John")
    buf[i] = ord("K")
    with pytest.raises(ValueError, match="CRC mismatch"):
        parse_archive(bytes(buf))


def test_transformed_docs_get_fresh_crc():
    """alter docs → re-serialize refreshes the footer CRC (reference
    into_bytes semantics) and the result re-parses cleanly."""
    arch = parse_archive(_golden_bytes())
    blk = next(b for b in arch.blocks if not b.eof)
    doc = decode_document(blk.docs_raw[0])[0]
    doc["name"] = "Redacted"
    blk.docs_raw[0] = encode_document(doc)
    out = serialize_archive(arch)
    assert out != _golden_bytes()
    arch2 = parse_archive(out)  # CRC verify passes on the NEW checksum
    got = decode_document(arch2.collections()[("test2", "Users")][0])[0]
    assert got["name"] == "Redacted"


def test_build_parse_roundtrip_multi_collection():
    archive = build_archive({
        "users": [{"_id": 1, "name": "a", "tags": ["x", "y"]},
                  {"_id": 2, "name": "b", "tags": []}],
        "orders": [{"_id": Int64(10), "total": 9.5,
                    "lines": [{"sku": "s1", "qty": 2}]}],
    }, db="shop")
    arch = parse_archive(archive)
    cols = arch.collections()
    assert set(cols) == {("shop", "users"), ("shop", "orders")}
    users = [decode_document(r)[0] for r in cols[("shop", "users")]]
    assert [u["_id"] for u in users] == [1, 2]
    assert serialize_archive(arch) == archive


def test_read_mongo_archive_distributed(spark, tmp_path):
    archive = build_archive({
        "users": [{"_id": i, "name": f"user-{i}",
                   "contact": {"email": f"u{i}@x.io", "age": 20 + i}}
                  for i in range(50)],
        "events": [{"_id": i, "kind": "click"} for i in range(10)],
    }, db="app")
    p = tmp_path / "dump.archive"
    p.write_bytes(archive)
    out = read_mongo_archive(spark, str(p))
    assert set(out) == {"users", "events"}
    rows = out["users"].selectExpr("_id", "name", "contact.email",
                                   "contact.age").collect()
    assert len(rows) == 50
    byid = {r[0]: (r[1], r[2], r[3]) for r in rows}
    assert byid[7] == ("user-7", "u7@x.io", 27)
    assert out["events"].count() == 10


def test_doc_to_json_extended_types():
    j = doc_to_json({"_id": ObjectId(b"\x01" * 12), "t": UTCDatetime(5),
                     "b": Binary(0, b"hi")})
    assert '"$oid"' in j and '"$date":5' in j and '"$binary"' in j


def test_multi_database_archive_collections_not_merged(spark, tmp_path):
    """An archive holding db1.users AND db2.users must come back as TWO
    frames keyed 'db1.users'/'db2.users' — the old collection-only key
    interleaved both databases' documents into one frame with a unioned
    inferred schema."""
    import json as _json

    from replibyte_spark.sources.mongo_archive import (
        Archive, Block, Int64, crc64_xz, serialize_archive)

    def meta(db):
        return encode_document({
            "db": db, "collection": "users",
            "metadata": _json.dumps({"indexes": [],
                                     "collectionName": "users",
                                     "type": "collection"}),
            "size": 0, "type": "collection"})

    def blocks(db, docs):
        crc = crc64_xz(b"".join(docs))
        signed = crc - (1 << 64) if crc >= (1 << 63) else crc
        hdr = encode_document({"db": db, "collection": "users",
                               "EOF": False, "CRC": Int64(0)})
        ftr = encode_document({"db": db, "collection": "users",
                               "EOF": True, "CRC": Int64(signed)})
        return [Block(hdr, db, "users", False, 0, list(docs)),
                Block(ftr, db, "users", True, signed, [])]

    d1 = [encode_document({"_id": 1, "who": "db1"})]
    d2 = [encode_document({"_id": 2, "extra": 7})]
    hdr = encode_document({"concurrent_collections": 1, "version": "0.1",
                           "server_version": "5.0.6",
                           "tool_version": "100.5.2"})
    arch = Archive(hdr, [meta("db1"), meta("db2")],
                   blocks("db1", d1) + blocks("db2", d2))
    path = tmp_path / "multi.archive"
    path.write_bytes(serialize_archive(arch))

    out = read_mongo_archive(spark, str(path))
    assert set(out) == {"db1.users", "db2.users"}
    assert [r._id for r in out["db1.users"].collect()] == [1]
    assert [r._id for r in out["db2.users"].collect()] == [2]
    assert "extra" not in out["db1.users"].columns  # schemas not unioned
