"""Custom-WASM transformer tests.

A reverse-string WASI command module — functionally equivalent to the
reference's examples/wasm/wasm-transformer-reverse-string.wasm (1.8 MB of
Rust) — is assembled here byte-by-byte (~200 bytes) and executed through the
built-in interpreter, so the WASM path is exercised even without wasmtime.
The reference's ACTUAL Rust-built module also runs under the built-in
interpreter (floats + sign-ext + saturating truncations + call_indirect
landed in round 4), wasmtime or not; when wasmtime IS importable the same
modules run under it too.
"""

from __future__ import annotations

import os

import pytest

from replibyte_spark.functions import wasm as W

REF_WASM = "/root/reference/examples/wasm/wasm-transformer-reverse-string.wasm"


# ---------------------------------------------------------------------------
# module assembler (test-local: the module is DATA, built from public spec)
# ---------------------------------------------------------------------------


def _u(n: int) -> bytes:        # unsigned LEB128
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _sec(sec_id: int, payload: bytes) -> bytes:
    return bytes([sec_id]) + _u(len(payload)) + payload


def _vec(items: list[bytes]) -> bytes:
    return _u(len(items)) + b"".join(items)


def _name(s: str) -> bytes:
    b = s.encode()
    return _u(len(b)) + b


I32, EMPTY = 0x7F, 0x40
(GET, SET, _TEE) = (0x20, 0x21, 0x22)
(CONST, ADD, SUB, EQ, GE_S, GT_S, LOAD, LOAD8U, STORE, STORE8) = (
    0x41, 0x6A, 0x6B, 0x46, 0x4E, 0x4A, 0x28, 0x2D, 0x36, 0x3A)
(BLOCK, LOOP, IF, END, BR, BR_IF, CALL, DROP) = (
    0x02, 0x03, 0x04, 0x0B, 0x0C, 0x0D, 0x10, 0x1A)

BUF = 64          # input/output buffer
IOV_R, NREAD = 0, 8
IOV_W, NWRITTEN = 16, 24


def _i32(n: int) -> bytes:      # i32.const with signed LEB128 immediate
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        done = (n == 0 and not b & 0x40) or (n == -1 and b & 0x40)
        out.append(b | (0 if done else 0x80))
        if done:
            return bytes([CONST]) + bytes(out)


def _mem(op: int, offset: int = 0) -> bytes:
    return bytes([op]) + _u(0) + _u(offset)          # align=0, offset


def build_reverse_wasm() -> bytes:
    """A WASI command module: read stdin, reverse the (newline-stripped)
    bytes, write to stdout.  Mirrors the reference example's contract."""
    # locals: 0=n 1=i 2=j 3=tmp
    body = bytearray()
    # iovec for read: base BUF, len 4096
    body += _i32(IOV_R) + _i32(BUF) + _mem(STORE)
    body += _i32(IOV_R + 4) + _i32(4096) + _mem(STORE)
    # fd_read(0, IOV_R, 1, NREAD)
    body += _i32(0) + _i32(IOV_R) + _i32(1) + _i32(NREAD)
    body += bytes([CALL]) + _u(0) + bytes([DROP])
    body += _i32(NREAD) + _mem(LOAD) + bytes([SET]) + _u(0)      # n = *NREAD
    # if n>0 and buf[n-1]=='\n': n -= 1
    body += bytes([GET]) + _u(0) + _i32(0) + bytes([GT_S])
    body += bytes([IF, EMPTY])
    body += _i32(BUF - 1) + bytes([GET]) + _u(0) + bytes([ADD]) + _mem(LOAD8U)
    body += _i32(10) + bytes([EQ])
    body += bytes([IF, EMPTY])
    body += bytes([GET]) + _u(0) + _i32(1) + bytes([SUB]) + bytes([SET]) + _u(0)
    body += bytes([END, END])
    # i = 0; j = n - 1
    body += _i32(0) + bytes([SET]) + _u(1)
    body += bytes([GET]) + _u(0) + _i32(1) + bytes([SUB]) + bytes([SET]) + _u(2)
    # while i < j: swap buf[i], buf[j]
    body += bytes([BLOCK, EMPTY, LOOP, EMPTY])
    body += bytes([GET]) + _u(1) + bytes([GET]) + _u(2) + bytes([GE_S])
    body += bytes([BR_IF]) + _u(1)                                # exit block
    body += bytes([GET]) + _u(1) + _mem(LOAD8U, BUF) + bytes([SET]) + _u(3)
    body += (bytes([GET]) + _u(1)
             + bytes([GET]) + _u(2) + _mem(LOAD8U, BUF) + _mem(STORE8, BUF))
    body += bytes([GET]) + _u(2) + bytes([GET]) + _u(3) + _mem(STORE8, BUF)
    body += bytes([GET]) + _u(1) + _i32(1) + bytes([ADD]) + bytes([SET]) + _u(1)
    body += bytes([GET]) + _u(2) + _i32(1) + bytes([SUB]) + bytes([SET]) + _u(2)
    body += bytes([BR]) + _u(0) + bytes([END, END])
    # iovec for write: base BUF, len n; fd_write(1, IOV_W, 1, NWRITTEN)
    body += _i32(IOV_W) + _i32(BUF) + _mem(STORE)
    body += _i32(IOV_W + 4) + bytes([GET]) + _u(0) + _mem(STORE)
    body += _i32(1) + _i32(IOV_W) + _i32(1) + _i32(NWRITTEN)
    body += bytes([CALL]) + _u(1) + bytes([DROP])
    body += bytes([END])

    func_body = _vec([_u(4) + bytes([I32])]) + bytes(body)       # 4 i32 locals
    fd_type = bytes([0x60]) + _vec([bytes([I32])] * 4) + _vec([bytes([I32])])
    void_type = bytes([0x60]) + _vec([]) + _vec([])
    return (
        b"\x00asm\x01\x00\x00\x00"
        + _sec(1, _vec([fd_type, void_type]))
        + _sec(2, _vec([
            _name("wasi_snapshot_preview1") + _name("fd_read") + b"\x00" + _u(0),
            _name("wasi_snapshot_preview1") + _name("fd_write") + b"\x00" + _u(0),
        ]))
        + _sec(3, _vec([_u(1)]))                                  # _start: type 1
        + _sec(5, _vec([b"\x00" + _u(1)]))                        # memory min 1
        + _sec(7, _vec([_name("memory") + b"\x02" + _u(0),
                        _name("_start") + b"\x00" + _u(2)]))
        + _sec(10, _vec([_u(len(func_body)) + func_body]))
    )


# ---------------------------------------------------------------------------
# interpreter unit tests
# ---------------------------------------------------------------------------


def test_interpreter_reverses_stdin():
    wasm = build_reverse_wasm()
    mod = W.WasmModule(wasm)
    assert mod.run_wasi(b"hello world\n") == b"dlrow olleh"
    assert mod.run_wasi(b"abc") == b"cba"            # no trailing newline
    assert mod.run_wasi(b"\n") == b""
    assert mod.run_wasi(b"") == b""
    assert mod.run_wasi("café!\n".encode()) == "café!".encode()[::-1]


def test_transform_values_contract():
    """The reference's per-value contract: value+\\n in, trimmed stdout out
    (custom_wasm.rs:66-99); None passes through."""
    wasm = build_reverse_wasm()
    assert W.wasm_transform_values(wasm, ["abc", None, "12345"]) == \
        ["cba", None, "54321"]


def test_unsupported_opcode_traps_cleanly():
    with pytest.raises(W.WasmError):
        W.WasmModule(b"\x00asm\x02\x00\x00\x00")     # bad version


# ---------------------------------------------------------------------------
# float / sign-ext / trunc-sat ops (the subset Rust-built modules emit)
# ---------------------------------------------------------------------------

import struct as _struct


def _f64c(v: float) -> bytes:
    return bytes([0x44]) + _struct.pack("<d", v)


def _f32c(v: float) -> bytes:
    return bytes([0x43]) + _struct.pack("<f", v)


def build_float_module() -> bytes:
    """Exports `run: () -> i32` returning 1 iff every float/sign-ext check
    holds (each check ANDs into the accumulator)."""
    AND = 0x71
    body = bytearray()
    # f64: sqrt(2.0) == the IEEE double closest to √2
    body += _f64c(2.0) + bytes([0x9F])                     # f64.sqrt
    body += _f64c(1.4142135623730951) + bytes([0x61])      # f64.eq
    # f32: 1.5 + 2.5 == 4.0 (exact in binary32)
    body += _f32c(1.5) + _f32c(2.5) + bytes([0x92])        # f32.add
    body += _f32c(4.0) + bytes([0x5B]) + bytes([AND])      # f32.eq
    # f32 single-precision rounding: demote_f64(0.1) == f32.const 0.1
    body += _f64c(0.1) + bytes([0xB6])                     # f32.demote_f64
    body += _f32c(0.1) + bytes([0x5B]) + bytes([AND])
    # saturating trunc (Rust `as` casts): trunc_sat_f64_s(-7.9) == -7
    body += _f64c(-7.9) + bytes([0xFC]) + _u(2)            # i32.trunc_sat_f64_s
    body += _i32(-7) + bytes([EQ]) + bytes([AND])
    # ...and it saturates instead of trapping
    body += _f64c(1e300) + bytes([0xFC]) + _u(2)
    body += _i32(2**31 - 1) + bytes([EQ]) + bytes([AND])
    # conversions: f64.convert_i32_s(-3) * -0.5 == 1.5
    body += _i32(-3) + bytes([0xB7])                       # f64.convert_i32_s
    body += _f64c(-0.5) + bytes([0xA2])                    # f64.mul
    body += _f64c(1.5) + bytes([0x61]) + bytes([AND])
    # min/max NaN-free path + copysign
    body += _f64c(3.0) + _f64c(-2.0) + bytes([0xA4])       # f64.min
    body += _f64c(-2.0) + bytes([0x61]) + bytes([AND])
    body += _f64c(5.0) + _f64c(-1.0) + bytes([0xA6])       # f64.copysign
    body += _f64c(-5.0) + bytes([0x61]) + bytes([AND])
    # sign extension: i32.extend8_s(0x80) == -128
    body += _i32(0x80) + bytes([0xC0])                     # i32.extend8_s
    body += _i32(-128) + bytes([EQ]) + bytes([AND])
    # reinterpret roundtrip: f64 -> i64 -> f64 is identity
    body += _f64c(2.5) + bytes([0xBD])                     # i64.reinterpret_f64
    body += bytes([0xBF])                                  # f64.reinterpret_i64
    body += _f64c(2.5) + bytes([0x61]) + bytes([AND])
    body += bytes([END])
    func_body = _vec([]) + bytes(body)                     # no locals
    t_run = bytes([0x60]) + _vec([]) + _vec([bytes([I32])])
    return (b"\x00asm\x01\x00\x00\x00"
            + _sec(1, _vec([t_run]))
            + _sec(3, _vec([_u(0)]))
            + _sec(7, _vec([_name("run") + b"\x00" + _u(0)]))
            + _sec(10, _vec([_u(len(func_body)) + func_body])))


def test_interpreter_float_ops():
    mod = W.WasmModule(build_float_module())
    inst = W._Instance(mod, b"")
    assert inst.call(mod.exports["run"][1], []) == [1]


@pytest.mark.skipif(not os.path.exists(REF_WASM),
                    reason="reference module unavailable")
def test_interpreter_runs_reference_rust_module():
    """The interpreter twin of test_wasmtime_runs_reference_rust_module:
    the reference's shipped 1.8 MB Rust-built transformer runs under the
    BUILT-IN interpreter — no wasmtime — through the same per-value
    contract the conf.yaml custom-wasm path uses."""
    with open(REF_WASM, "rb") as fh:
        wasm = fh.read()
    mod = W.WasmModule(wasm)
    assert mod.run_wasi(b"hello\n").strip() == b"olleh"
    assert W.wasm_transform_values(wasm, ["hello", None, "abc123"]) == \
        ["olleh", None, "321cba"]


def build_call_indirect_module() -> bytes:
    """Two table entries with the SAME arity but different param types:
    f0: (i32)->i32 identity, f1: (f32)->i32 const.  `go(v, idx)` does
    call_indirect with type (i32)->i32 — entry 1 must trap (signature
    mismatch on valtypes, not arity)."""
    F32 = 0x7D
    t0 = bytes([0x60]) + _vec([bytes([I32])]) + _vec([bytes([I32])])
    t1 = bytes([0x60]) + _vec([bytes([F32])]) + _vec([bytes([I32])])
    t_go = bytes([0x60]) + _vec([bytes([I32])] * 2) + _vec([bytes([I32])])
    f0 = _vec([]) + bytes([GET]) + _u(0) + bytes([END])
    f1 = _vec([]) + _i32(7) + bytes([END])
    go = (_vec([]) + bytes([GET]) + _u(0) + bytes([GET]) + _u(1)
          + bytes([0x11]) + _u(0) + _u(0) + bytes([END]))  # call_indirect t0
    elem = b"\x00" + _i32(0) + bytes([END]) + _vec([_u(0), _u(1)])
    return (b"\x00asm\x01\x00\x00\x00"
            + _sec(1, _vec([t0, t1, t_go]))
            + _sec(3, _vec([_u(0), _u(1), _u(2)]))
            + _sec(4, _vec([b"\x70\x00" + _u(2)]))
            + _sec(7, _vec([_name("go") + b"\x00" + _u(2)]))
            + _sec(9, _vec([elem]))
            + _sec(10, _vec([_u(len(b)) + b for b in (f0, f1, go)])))


def test_call_indirect_checks_valtypes_not_arity():
    mod = W.WasmModule(build_call_indirect_module())
    inst = W._Instance(mod, b"")
    assert inst.call(mod.exports["go"][1], [5, 0]) == [5]
    with pytest.raises(W.WasmTrap, match="signature mismatch"):
        W._Instance(mod, b"").call(mod.exports["go"][1], [5, 1])


def build_oob_module() -> bytes:
    """One 64 KiB page; `peek` reads 4 bytes starting 2 bytes before the
    end (partial oob), `poke` writes 8 bytes starting 6 bytes before the
    end — both must trap, not silently truncate."""
    t_peek = bytes([0x60]) + _vec([]) + _vec([bytes([0x7E])])   # ()->i64
    t_poke = bytes([0x60]) + _vec([]) + _vec([])
    peek = _vec([]) + _i32(65534) + _mem(0x35) + bytes([END])   # i64.load32_u
    poke = (_vec([]) + _i32(65530) + _i32(1) + bytes([0xAD])    # extend_i32_u
            + _mem(0x37) + bytes([END]))                        # i64.store
    return (b"\x00asm\x01\x00\x00\x00"
            + _sec(1, _vec([t_peek, t_poke]))
            + _sec(3, _vec([_u(0), _u(1)]))
            + _sec(5, _vec([b"\x00" + _u(1)]))
            + _sec(7, _vec([_name("peek") + b"\x00" + _u(0),
                            _name("poke") + b"\x00" + _u(1)]))
            + _sec(10, _vec([_u(len(b)) + b for b in (peek, poke)])))


def test_partial_width_memory_ops_trap_out_of_bounds():
    mod = W.WasmModule(build_oob_module())
    with pytest.raises(W.WasmTrap, match="oob load"):
        W._Instance(mod, b"").call(mod.exports["peek"][1], [])
    with pytest.raises(W.WasmTrap, match="oob store"):
        W._Instance(mod, b"").call(mod.exports["poke"][1], [])


def test_br_to_function_label_returns():
    """`br 0` at function top level targets the implicit function label —
    a return, not an IndexError on the empty control stack (LLVM emits
    this shape for early exits)."""
    t_run = bytes([0x60]) + _vec([]) + _vec([bytes([I32])])
    body = _vec([]) + _i32(42) + bytes([BR]) + _u(0) + _i32(7) + bytes([END])
    wasm = (b"\x00asm\x01\x00\x00\x00"
            + _sec(1, _vec([t_run]))
            + _sec(3, _vec([_u(0)]))
            + _sec(7, _vec([_name("run") + b"\x00" + _u(0)]))
            + _sec(10, _vec([_u(len(body)) + body])))
    mod = W.WasmModule(wasm)
    assert W._Instance(mod, b"").call(mod.exports["run"][1], []) == [42]


def test_memory_grow_in_callee_visible_to_caller():
    """memory.grow must extend the buffer IN PLACE: a callee growing
    memory (the malloc pattern) must leave the caller's view valid, so a
    store into the grown region succeeds instead of spuriously trapping."""
    t_grow = bytes([0x60]) + _vec([]) + _vec([])
    t_run = bytes([0x60]) + _vec([]) + _vec([bytes([I32])])
    grow = (_vec([]) + _i32(1) + bytes([0x40, 0x00]) + bytes([DROP])
            + bytes([END]))
    run = (_vec([]) + bytes([CALL]) + _u(0)
           + _i32(70000) + _i32(123) + _mem(STORE)     # page 2 address
           + _i32(70000) + _mem(LOAD) + bytes([END]))
    wasm = (b"\x00asm\x01\x00\x00\x00"
            + _sec(1, _vec([t_grow, t_run]))
            + _sec(3, _vec([_u(0), _u(1)]))
            + _sec(5, _vec([b"\x00" + _u(1)]))         # memory min 1 page
            + _sec(7, _vec([_name("run") + b"\x00" + _u(1)]))
            + _sec(10, _vec([_u(len(b)) + b for b in (grow, run)])))
    mod = W.WasmModule(wasm)
    assert W._Instance(mod, b"").call(mod.exports["run"][1], []) == [123]


def test_interpreter_rejects_module_without_start():
    wasm = build_reverse_wasm()
    mod = W.WasmModule(wasm)
    mod2 = W.WasmModule(wasm)
    mod2.exports.pop("_start")
    with pytest.raises(W.WasmError):
        mod2.run_wasi(b"x")
    assert mod.run_wasi(b"x") == b"x"


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def test_wasm_transformer_in_spark(spark, tmp_path):
    path = tmp_path / "reverse.wasm"
    path.write_bytes(build_reverse_wasm())
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "alice"), (2, "bob"), (3, None)], "id int, name string")
    out = (df.withColumn("name", W.wasm_transformer(str(path))("name"))
           .orderBy("id").collect())
    assert [r.name for r in out] == ["ecila", "bob"[::-1], None]
    assert [r.id for r in out] == [1, 2, 3]
    # other columns untouched
    assert df.schema["id"].dataType.simpleString() == "int"
    _ = F  # keep import local to the test


# ---------------------------------------------------------------------------
# wasmtime path (skipped where unavailable — this container has none)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not W._have_wasmtime(), reason="wasmtime not installed")
def test_wasmtime_runs_hand_built_module():
    assert W.wasi_run(build_reverse_wasm(), b"hello\n") == b"olleh"


@pytest.mark.skipif(
    not (W._have_wasmtime() and os.path.exists(REF_WASM)),
    reason="wasmtime or reference module unavailable")
def test_wasmtime_runs_reference_rust_module():
    with open(REF_WASM, "rb") as fh:
        wasm = fh.read()
    assert W.wasi_run(wasm, b"hello\n").strip() == b"olleh"


def test_memory_grow_respects_declared_max():
    """memory.grow past the module's declared maximum must return -1 and
    leave memory untouched, not extend unconditionally (spec: grow MAY
    fail; exceeding the declared max MUST fail)."""
    t_run = bytes([0x60]) + _vec([]) + _vec([bytes([I32])])
    run = _vec([]) + _i32(4) + bytes([0x40, 0x00]) + bytes([END])
    wasm = (b"\x00asm\x01\x00\x00\x00"
            + _sec(1, _vec([t_run]))
            + _sec(3, _vec([_u(0)]))
            + _sec(5, _vec([b"\x01" + _u(1) + _u(2)]))   # min 1, MAX 2
            + _sec(7, _vec([_name("run") + b"\x00" + _u(0)]))
            + _sec(10, _vec([_u(len(run)) + run])))
    mod = W.WasmModule(wasm)
    assert mod.mem_max == 2
    inst = W._Instance(mod, b"")
    assert inst.call(mod.exports["run"][1], []) == [0xFFFFFFFF]  # -1
    assert len(inst.mem) == W.PAGE                       # unchanged


def test_memory_grow_huge_delta_refused_not_oom():
    """delta = -1 (u32 0xFFFFFFFF pages ≈ 256 TiB) must return -1 instead
    of attempting the allocation; a sane grow on the same instance then
    still succeeds (returns old page count)."""
    t_run = bytes([0x60]) + _vec([]) + _vec([bytes([I32])])
    huge = _vec([]) + _i32(-1) + bytes([0x40, 0x00]) + bytes([END])
    sane = _vec([]) + _i32(1) + bytes([0x40, 0x00]) + bytes([END])
    wasm = (b"\x00asm\x01\x00\x00\x00"
            + _sec(1, _vec([t_run]))
            + _sec(3, _vec([_u(0), _u(0)]))
            + _sec(5, _vec([b"\x00" + _u(1)]))           # min 1, no max
            + _sec(7, _vec([_name("huge") + b"\x00" + _u(0),
                            _name("sane") + b"\x00" + _u(1)]))
            + _sec(10, _vec([_u(len(b)) + b for b in (huge, sane)])))
    mod = W.WasmModule(wasm)
    assert mod.mem_max is None
    inst = W._Instance(mod, b"")
    assert inst.call(mod.exports["huge"][1], []) == [0xFFFFFFFF]
    assert len(inst.mem) == W.PAGE
    assert inst.call(mod.exports["sane"][1], []) == [1]  # old size
    assert len(inst.mem) == 2 * W.PAGE
