"""Custom WASM transformers — the reference's one extension point, executed.

The reference runs user-supplied WebAssembly modules under WASI stdio
semantics: the cell value plus a newline is written to the module's stdin, the
exported ``_start`` function runs, and trimmed stdout becomes the transformed
value (/root/reference/replibyte/src/transformer/custom_wasm.rs:66-99, example
module at /root/reference/examples/wasm/).

Spark-first layout: the module bytes broadcast to executors inside the UDF
closure; each Arrow batch loops values through a fresh instance (the reference
also instantiates per value — instances are cheap, the parsed/compiled module
is cached).  Two runtimes:

- ``wasmtime`` when importable — full WASM + WASI, runs arbitrary modules
  (including the reference's Rust-built example).
- a built-in pure-Python interpreter otherwise, covering the MVP numeric
  subset (integers AND F32/F64 floats: arithmetic, comparisons,
  conversions, reinterprets, saturating truncations, sign-extensions) +
  WASI stdio (``fd_read``/``fd_write``/``proc_exit``...).  Enough to run
  locally-built transformer modules — including Rust-built ones whose
  codegen reaches float and sign-ext ops — where ``wasmtime`` isn't
  installable; traps clearly on unsupported constructs (SIMD/vector ops,
  reference types and table-mutation ops, multi-memory, bulk-memory
  beyond memory.fill/copy — funcref tables + call_indirect ARE
  supported).

This module is self-contained on purpose: no third-party imports unless
``wasmtime`` is actually present.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from functools import lru_cache

PAGE = 65536


class WasmError(Exception):
    """Malformed module or unsupported construct."""


class WasmTrap(Exception):
    """Runtime trap (unreachable, OOB access, div by zero...)."""


class ProcExit(Exception):
    def __init__(self, code: int):
        super().__init__(f"proc_exit({code})")
        self.code = code


# ---------------------------------------------------------------------------
# binary reader
# ---------------------------------------------------------------------------


class _Reader:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes, i: int = 0):
        self.b, self.i = b, i

    def u8(self) -> int:
        v = self.b[self.i]
        self.i += 1
        return v

    def u32(self) -> int:  # unsigned LEB128
        r = s = 0
        while True:
            byte = self.u8()
            r |= (byte & 0x7F) << s
            if not byte & 0x80:
                return r
            s += 7

    def s_leb(self) -> int:  # signed LEB128 (i32/i64 const)
        r = s = 0
        while True:
            byte = self.u8()
            r |= (byte & 0x7F) << s
            s += 7
            if not byte & 0x80:
                if byte & 0x40:
                    r -= 1 << s
                return r

    def bytes_(self, n: int) -> bytes:
        v = self.b[self.i:self.i + n]
        self.i += n
        return v

    def name(self) -> str:
        return self.bytes_(self.u32()).decode("utf-8")


# ---------------------------------------------------------------------------
# module structure
# ---------------------------------------------------------------------------


@dataclass
class _Func:
    type_idx: int
    locals: list[int] = field(default_factory=list)   # count of extra locals
    code: list = field(default_factory=list)          # decoded instructions
    end_of: dict = field(default_factory=dict)        # block/loop/if pc -> end pc
    else_of: dict = field(default_factory=dict)       # if pc -> else pc


@dataclass
class _Import:
    module: str
    name: str
    type_idx: int


class WasmModule:
    """Parsed WASM binary (structure + pre-decoded function bodies)."""

    def __init__(self, raw: bytes):
        if raw[:4] != b"\x00asm" or raw[4:8] != b"\x01\x00\x00\x00":
            raise WasmError("not a wasm v1 binary")
        # (param_valtype_bytes, result_valtype_bytes) — full signatures, so
        # call_indirect can trap on same-arity-different-type mismatches.
        self.types: list[tuple[bytes, bytes]] = []
        self.imports: list[_Import] = []
        self.funcs: list[_Func] = []                  # local functions only
        self.mem_min = 0
        self.mem_max: int | None = None               # declared page limit
        self.globals_init: list[int] = []
        self.exports: dict[str, tuple[int, int]] = {}  # name -> (kind, idx)
        self.data: list[tuple[int, bytes]] = []
        self.start: int | None = None
        self.table_min = 0                            # funcref table size
        self.elem: list[tuple[int, list[int]]] = []   # (offset, func idxs)
        self._parse(raw)

    # -- parsing ------------------------------------------------------------

    def _parse(self, raw: bytes) -> None:
        r = _Reader(raw, 8)
        func_type_idxs: list[int] = []
        while r.i < len(raw):
            sec_id = r.u8()
            size = r.u32()
            end = r.i + size
            if sec_id == 1:                           # types
                for _ in range(r.u32()):
                    if r.u8() != 0x60:
                        raise WasmError("bad functype")
                    params = bytes(r.bytes_(r.u32()))
                    results = bytes(r.bytes_(r.u32()))
                    self.types.append((params, results))
            elif sec_id == 2:                         # imports
                for _ in range(r.u32()):
                    mod, name = r.name(), r.name()
                    kind = r.u8()
                    if kind == 0:
                        self.imports.append(_Import(mod, name, r.u32()))
                    elif kind == 2:                   # imported memory
                        flags = r.u8()
                        self.mem_min = r.u32()
                        if flags & 1:
                            self.mem_max = r.u32()
                    else:
                        raise WasmError(f"unsupported import kind {kind}")
            elif sec_id == 3:                         # function decls
                func_type_idxs = [r.u32() for _ in range(r.u32())]
            elif sec_id == 4:                         # tables (funcref)
                for _ in range(r.u32()):
                    if r.u8() != 0x70:
                        raise WasmError("unsupported table reftype")
                    flags = r.u8()
                    self.table_min = r.u32()
                    if flags & 1:
                        r.u32()
            elif sec_id == 5:                         # memory
                for _ in range(r.u32()):
                    flags = r.u8()
                    self.mem_min = r.u32()
                    if flags & 1:
                        self.mem_max = r.u32()
            elif sec_id == 6:                         # globals
                for _ in range(r.u32()):
                    r.u8()                            # valtype
                    r.u8()                            # mutability
                    self.globals_init.append(self._const_expr(r))
            elif sec_id == 7:                         # exports
                for _ in range(r.u32()):
                    name = r.name()
                    kind, idx = r.u8(), r.u32()
                    self.exports[name] = (kind, idx)
            elif sec_id == 8:                         # start
                self.start = r.u32()
            elif sec_id == 9:                         # elements (active, tbl 0)
                for _ in range(r.u32()):
                    mode = r.u32()
                    if mode == 0:
                        off = self._const_expr(r)
                        self.elem.append(
                            (off, [r.u32() for _ in range(r.u32())]))
                    elif mode == 2:                   # active w/ explicit table
                        if r.u32() != 0:
                            raise WasmError("multi-table elem unsupported")
                        off = self._const_expr(r)
                        if r.u8() != 0x00:            # elemkind funcref
                            raise WasmError("unsupported elemkind")
                        self.elem.append(
                            (off, [r.u32() for _ in range(r.u32())]))
                    else:
                        raise WasmError(f"unsupported elem mode {mode}")
            elif sec_id == 10:                        # code
                n = r.u32()
                if n != len(func_type_idxs):
                    raise WasmError("code/function count mismatch")
                for ti in func_type_idxs:
                    body_size = r.u32()
                    body_end = r.i + body_size
                    f = _Func(ti)
                    for _ in range(r.u32()):
                        cnt = r.u32()
                        r.u8()                        # valtype (ignored: all 0)
                        f.locals.append(cnt)
                    self._decode_body(r, body_end, f)
                    self.funcs.append(f)
            elif sec_id == 11:                        # data
                for _ in range(r.u32()):
                    mode = r.u32()
                    if mode == 0:
                        off = self._const_expr(r)
                        self.data.append((off, r.bytes_(r.u32())))
                    elif mode == 1:                   # passive — ignore
                        r.bytes_(r.u32())
                    else:
                        raise WasmError("unsupported data mode")
            r.i = end                                 # skip/realign any section

    @staticmethod
    def _const_expr(r: _Reader):
        op = r.u8()
        if op in (0x41, 0x42):
            v = r.s_leb()
        elif op == 0x43:                              # f32.const
            v = struct.unpack("<f", r.bytes_(4))[0]
        elif op == 0x44:                              # f64.const
            v = struct.unpack("<d", r.bytes_(8))[0]
        else:
            raise WasmError(f"unsupported const expr opcode {op:#x}")
        if r.u8() != 0x0B:
            raise WasmError("const expr not terminated")
        return v

    def _decode_body(self, r: _Reader, body_end: int, f: _Func) -> None:
        """Decode to (op, imm) tuples; resolve block/loop/if -> end/else."""
        code = f.code
        ctrl: list[int] = []
        while r.i < body_end:
            op = r.u8()
            imm = None
            if op in (0x02, 0x03, 0x04):              # block/loop/if
                bt = r.u8()                           # blocktype
                if bt not in (0x40, 0x7F, 0x7E, 0x7D, 0x7C):
                    raise WasmError("unsupported blocktype (multi-value)")
                imm = 0 if bt == 0x40 else 1          # result arity
                ctrl.append(len(code))
            elif op == 0x05:                          # else
                f.else_of[ctrl[-1]] = len(code)
            elif op == 0x0B:                          # end
                if ctrl:
                    f.end_of[ctrl.pop()] = len(code)
            elif op in (0x0C, 0x0D):                  # br / br_if
                imm = r.u32()
            elif op == 0x0E:                          # br_table
                labels = [r.u32() for _ in range(r.u32())]
                imm = (labels, r.u32())
            elif op in (0x10,):                       # call
                imm = r.u32()
            elif op == 0x11:                          # call_indirect
                imm = (r.u32(), r.u32())
            elif op in (0x20, 0x21, 0x22, 0x23, 0x24):  # local/global
                imm = r.u32()
            elif 0x28 <= op <= 0x3E:                  # loads/stores
                r.u32()                               # align hint (ignored)
                imm = r.u32()                         # offset
            elif op in (0x3F, 0x40):                  # memory.size/grow
                r.u8()
            elif op in (0x41, 0x42):                  # i32/i64.const
                imm = r.s_leb()
            elif op in (0x43,):                       # f32.const
                imm = struct.unpack("<f", r.bytes_(4))[0]
            elif op == 0x44:                          # f64.const
                imm = struct.unpack("<d", r.bytes_(8))[0]
            elif op == 0xFC:                          # saturating/bulk prefix
                sub = r.u32()
                if sub in (10, 11):                   # memory.copy / fill
                    r.u8()
                    if sub == 10:
                        r.u8()
                imm = sub
            code.append((op, imm))
        if not code or code[-1][0] != 0x0B:
            raise WasmError("function body not terminated")

    # -- convenience --------------------------------------------------------

    @classmethod
    def from_file(cls, path: str) -> "WasmModule":
        with open(path, "rb") as fh:
            return cls(fh.read())

    def n_imported_funcs(self) -> int:
        return len(self.imports)

    def run_wasi(self, stdin: bytes = b"") -> bytes:
        """Fresh instance: feed `stdin`, call exported _start, return stdout."""
        inst = _Instance(self, stdin)
        return inst.run_start()


# ---------------------------------------------------------------------------
# interpreter
# ---------------------------------------------------------------------------

_M32, _M64 = (1 << 32) - 1, (1 << 64) - 1


def _s32(v: int) -> int:
    return v - (1 << 32) if v & 0x80000000 else v


def _s64(v: int) -> int:
    return v - (1 << 64) if v & (1 << 63) else v


class _Instance:
    def __init__(self, mod: WasmModule, stdin: bytes):
        self.m = mod
        self.mem = bytearray(mod.mem_min * PAGE)
        for off, seg in mod.data:
            self.mem[off:off + len(seg)] = seg
        self.globals = list(mod.globals_init)
        self.table: list[int | None] = [None] * mod.table_min
        for off, idxs in mod.elem:
            if off + len(idxs) > len(self.table):
                self.table.extend([None] * (off + len(idxs) - len(self.table)))
            self.table[off:off + len(idxs)] = idxs
        self.stdin = stdin
        self.stdin_pos = 0
        self.stdout = bytearray()
        self.stderr = bytearray()
        self.host = [self._bind_host(im) for im in mod.imports]

    # -- WASI ---------------------------------------------------------------

    def _bind_host(self, im: _Import):
        key = (im.module, im.name)
        params, results = self.m.types[im.type_idx]
        n_params, n_results = len(params), len(results)
        table = {
            ("wasi_snapshot_preview1", "fd_read"): self._fd_read,
            ("wasi_snapshot_preview1", "fd_write"): self._fd_write,
            ("wasi_snapshot_preview1", "fd_close"): lambda *a: [0],
            ("wasi_snapshot_preview1", "fd_fdstat_get"): lambda *a: [0],
            ("wasi_snapshot_preview1", "proc_exit"): self._proc_exit,
            ("wasi_snapshot_preview1", "environ_sizes_get"): self._zero2,
            ("wasi_snapshot_preview1", "environ_get"): lambda *a: [0],
            ("wasi_snapshot_preview1", "args_sizes_get"): self._zero2,
            ("wasi_snapshot_preview1", "args_get"): lambda *a: [0],
            ("wasi_snapshot_preview1", "random_get"): self._random_get,
            ("wasi_snapshot_preview1", "clock_time_get"): lambda *a: [0],
            ("wasi_unstable", "fd_read"): self._fd_read,
            ("wasi_unstable", "fd_write"): self._fd_write,
        }
        fn = table.get(key)
        if fn is None:
            def missing(*_a, _key=key):
                raise WasmTrap(f"call to unsupported import {_key}")
            return (missing, n_params, n_results)
        return (fn, n_params, n_results)

    def _zero2(self, count_ptr, size_ptr):
        self._store32(count_ptr, 0)
        self._store32(size_ptr, 0)
        return [0]

    def _random_get(self, ptr, n):
        self.mem[ptr:ptr + n] = b"\x00" * n           # deterministic by design
        return [0]

    def _proc_exit(self, code):
        raise ProcExit(code)

    def _iovs(self, ptr, n):
        for k in range(n):
            base = self._load32(ptr + 8 * k)
            ln = self._load32(ptr + 8 * k + 4)
            yield base, ln

    def _fd_read(self, fd, iovs, iovs_len, nread_ptr):
        total = 0
        for base, ln in self._iovs(iovs, iovs_len):
            chunk = self.stdin[self.stdin_pos:self.stdin_pos + ln]
            self.mem[base:base + len(chunk)] = chunk
            self.stdin_pos += len(chunk)
            total += len(chunk)
            if len(chunk) < ln:
                break
        self._store32(nread_ptr, total)
        return [0]

    def _fd_write(self, fd, iovs, iovs_len, nwritten_ptr):
        sink = self.stderr if fd == 2 else self.stdout
        total = 0
        for base, ln in self._iovs(iovs, iovs_len):
            sink += self.mem[base:base + ln]
            total += ln
        self._store32(nwritten_ptr, total)
        return [0]

    # -- memory helpers -----------------------------------------------------

    def _load32(self, a: int) -> int:
        # explicit bounds check: bytearray slicing never raises, so a
        # try/except around it is dead code and an oob WASI pointer would
        # silently read a truncated/zero value instead of trapping
        if a < 0 or a + 4 > len(self.mem):
            raise WasmTrap("oob load")
        return int.from_bytes(self.mem[a:a + 4], "little")

    def _store32(self, a: int, v: int) -> None:
        if a < 0 or a + 4 > len(self.mem):
            raise WasmTrap("oob store")
        self.mem[a:a + 4] = (v & _M32).to_bytes(4, "little")

    # -- execution ----------------------------------------------------------

    def run_start(self) -> bytes:
        if self.m.start is not None:
            self.call(self.m.start, [])
        exp = self.m.exports.get("_start")
        if exp is None or exp[0] != 0:
            raise WasmError("module exports no _start function")
        try:
            self.call(exp[1], [])
        except ProcExit as e:
            if e.code != 0:
                raise
        return bytes(self.stdout)

    def call(self, func_idx: int, args: list[int]) -> list[int]:
        n_imp = self.m.n_imported_funcs()
        if func_idx < n_imp:
            fn, n_params, _ = self.host[func_idx]
            return fn(*args)
        f = self.m.funcs[func_idx - n_imp]
        n_results = len(self.m.types[f.type_idx][1])
        locals_ = list(args) + [0] * sum(f.locals)
        stack = self._exec(f, locals_)
        return stack[-n_results:] if n_results else []

    def _exec(self, f: _Func, loc: list[int]) -> list:
        code, end_of, else_of = f.code, f.end_of, f.else_of
        mem = self.mem
        st: list = []
        # control entries: (is_loop, br_target_pc, arity, stack_base) —
        # br_target is the loop header itself (re-executes, re-pushing the
        # entry) or the instruction AFTER the block/if's end.
        ctrl: list[tuple[bool, int, int, int]] = []
        pc = 0
        n_code = len(code)
        while pc < n_code:
            op, imm = code[pc]
            if op == 0x41 or op == 0x42:              # i32/i64.const
                st.append(imm & (_M32 if op == 0x41 else _M64))
            elif op == 0x43 or op == 0x44:            # f32/f64.const
                st.append(imm)
            elif op == 0x20:                          # local.get
                st.append(loc[imm])
            elif op == 0x21:                          # local.set
                loc[imm] = st.pop()
            elif op == 0x22:                          # local.tee
                loc[imm] = st[-1]
            elif op == 0x23:
                st.append(self.globals[imm])
            elif op == 0x24:
                self.globals[imm] = st.pop()
            elif op == 0x02:                          # block
                ctrl.append((False, end_of[pc] + 1, imm, len(st)))
            elif op == 0x03:                          # loop
                ctrl.append((True, pc, imm, len(st)))
            elif op == 0x04:                          # if
                cond = st.pop()
                if cond:
                    ctrl.append((False, end_of[pc] + 1, imm, len(st)))
                else:
                    els = else_of.get(pc)
                    if els is not None:               # run the else branch
                        ctrl.append((False, end_of[pc] + 1, imm, len(st)))
                        pc = els                      # falls to els+1 below
                    else:                             # no else: skip past end
                        pc = end_of[pc] + 1           # nothing pushed, no pop
                        continue
            elif op == 0x05:                          # else: true branch done
                pc = ctrl[-1][1] - 1                  # jump to the `end`
                continue
            elif op == 0x0B:                          # end
                if ctrl:
                    ctrl.pop()
            elif op == 0x0C or op == 0x0D:            # br / br_if
                if op == 0x0D and not st.pop():
                    pc += 1
                    continue
                if imm >= len(ctrl):  # implicit function-level label: return
                    break
                pc = self._branch(imm, ctrl, st)
                continue
            elif op == 0x0E:                          # br_table
                labels, default = imm
                k = st.pop()
                lbl = labels[k] if k < len(labels) else default
                if lbl >= len(ctrl):
                    break
                pc = self._branch(lbl, ctrl, st)
                continue
            elif op == 0x0F:                          # return
                break
            elif op == 0x10:                          # call
                n_p = len(self._func_type(imm)[0])
                args = st[len(st) - n_p:] if n_p else []
                del st[len(st) - n_p:]
                st.extend(self.call(imm, args))
            elif op == 0x11:                          # call_indirect
                type_idx, _tbl = imm
                k = st.pop()
                if k >= len(self.table) or self.table[k] is None:
                    raise WasmTrap(f"call_indirect: null/oob table entry {k}")
                target = self.table[k]
                # full valtype-byte comparison, not arity counts: a table
                # entry of matching arity but different param/result types
                # must trap exactly like wasmtime does
                if self._func_type(target) != self.m.types[type_idx]:
                    raise WasmTrap("call_indirect: signature mismatch")
                n_p = len(self._func_type(target)[0])
                args = st[len(st) - n_p:] if n_p else []
                del st[len(st) - n_p:]
                st.extend(self.call(target, args))
            elif op == 0x1A:                          # drop
                st.pop()
            elif op == 0x1B:                          # select
                c, b, a = st.pop(), st.pop(), st.pop()
                st.append(a if c else b)
            elif op == 0x28:                          # i32.load
                a = st.pop() + imm
                if a + 4 > len(mem):
                    raise WasmTrap("oob load")
                st.append(int.from_bytes(mem[a:a + 4], "little"))
            elif op == 0x29:                          # i64.load
                a = st.pop() + imm
                if a + 8 > len(mem):
                    raise WasmTrap("oob load")
                st.append(int.from_bytes(mem[a:a + 8], "little"))
            elif op == 0x2C:                          # i32.load8_s
                a = st.pop() + imm
                if a >= len(mem):
                    raise WasmTrap("oob load")
                v = mem[a]
                st.append((v - 256 if v & 0x80 else v) & _M32)
            elif op == 0x2D:                          # i32.load8_u
                a = st.pop() + imm
                if a >= len(mem):
                    raise WasmTrap("oob load")
                st.append(mem[a])
            elif op == 0x2E:                          # i32.load16_s
                a = st.pop() + imm
                if a + 2 > len(mem):
                    raise WasmTrap("oob load")
                v = int.from_bytes(mem[a:a + 2], "little")
                st.append((v - 65536 if v & 0x8000 else v) & _M32)
            elif op == 0x2F:                          # i32.load16_u
                a = st.pop() + imm
                if a + 2 > len(mem):
                    raise WasmTrap("oob load")
                st.append(int.from_bytes(mem[a:a + 2], "little"))
            elif op == 0x36:                          # i32.store
                v, a = st.pop(), st.pop() + imm
                if a + 4 > len(mem):
                    raise WasmTrap("oob store")
                mem[a:a + 4] = (v & _M32).to_bytes(4, "little")
            elif op == 0x37:                          # i64.store
                v, a = st.pop(), st.pop() + imm
                if a + 8 > len(mem):
                    raise WasmTrap("oob store")
                mem[a:a + 8] = (v & _M64).to_bytes(8, "little")
            elif op == 0x3A:                          # i32.store8
                v, a = st.pop(), st.pop() + imm
                if a >= len(mem):
                    raise WasmTrap("oob store")
                mem[a] = v & 0xFF
            elif op == 0x3B:                          # i32.store16
                v, a = st.pop(), st.pop() + imm
                if a + 2 > len(mem):
                    raise WasmTrap("oob store")
                mem[a:a + 2] = (v & 0xFFFF).to_bytes(2, "little")
            elif op == 0x3F:                          # memory.size
                st.append(len(mem) // PAGE)
            elif op == 0x40:                          # memory.grow
                delta = st.pop() & _M32               # u32 per spec
                old = len(mem) // PAGE
                # the spec lets grow FAIL (result -1) instead of trapping:
                # refuse when the module's declared maximum would be
                # exceeded, or past the spec's 2^16-page (4 GiB) ceiling —
                # without this a hostile/buggy `(memory.grow (i32.const
                # -1))` made the interpreter attempt a multi-terabyte
                # bytearray extend instead of returning -1
                limit = self.m.mem_max if self.m.mem_max is not None \
                    else 65536
                if old + delta > min(limit, 65536):
                    st.append(_M32)                   # -1: grow refused
                else:
                    # grow IN PLACE: rebinding self.mem to a new bytearray
                    # would leave outer _exec frames (and their `mem`
                    # locals) pointing at the detached old buffer — a
                    # callee's grow then made the caller's stores
                    # spuriously trap or silently write to dead memory
                    mem.extend(bytes(delta * PAGE))
                    st.append(old)
            elif op == 0x45:                          # i32.eqz
                st.append(1 if st.pop() == 0 else 0)
            elif 0x46 <= op <= 0x4F:                  # i32 comparisons
                b, a = st.pop(), st.pop()
                st.append(_CMP32[op](a, b))
            elif op == 0x50:                          # i64.eqz
                st.append(1 if st.pop() == 0 else 0)
            elif 0x51 <= op <= 0x5A:                  # i64 comparisons
                b, a = st.pop(), st.pop()
                st.append(_CMP64[op](a, b))
            elif op == 0x67:                          # i32.clz
                v = st.pop()
                st.append(32 - v.bit_length() if v else 32)
            elif op == 0x68:                          # i32.ctz
                v = st.pop()
                st.append((v & -v).bit_length() - 1 if v else 32)
            elif op == 0x69:                          # i32.popcnt
                st.append(bin(st.pop()).count("1"))
            elif 0x6A <= op <= 0x78:                  # i32 arithmetic
                b, a = st.pop(), st.pop()
                st.append(_ARITH32[op](a, b))
            elif 0x7C <= op <= 0x8A:                  # i64 arithmetic
                b, a = st.pop(), st.pop()
                st.append(_ARITH64[op](a, b))
            elif op == 0x79:                          # i64.clz
                v = st.pop()
                st.append(64 - v.bit_length() if v else 64)
            elif op == 0x7A:
                v = st.pop()
                st.append((v & -v).bit_length() - 1 if v else 64)
            elif op == 0x7B:
                st.append(bin(st.pop()).count("1"))
            elif op == 0xA7:                          # i32.wrap_i64
                st.append(st.pop() & _M32)
            elif op == 0xAC:                          # i64.extend_i32_s
                st.append(_s32(st.pop()) & _M64)
            elif op == 0xAD:                          # i64.extend_i32_u
                st.append(st.pop())
            elif op == 0x00:                          # unreachable
                raise WasmTrap("unreachable executed")
            elif op == 0x01:                          # nop
                pass
            elif op == 0xFC and imm == 11:            # memory.fill
                n, v, d = st.pop(), st.pop(), st.pop()
                if d + n > len(mem):
                    raise WasmTrap("oob memory.fill")
                mem[d:d + n] = bytes([v & 0xFF]) * n
            elif op == 0xFC and imm == 10:            # memory.copy
                n, s_, d = st.pop(), st.pop(), st.pop()
                if d + n > len(mem) or s_ + n > len(mem):
                    raise WasmTrap("oob memory.copy")
                mem[d:d + n] = mem[s_:s_ + n]
            # -- i64 partial-width loads/stores (Rust memcpy lowering) ------
            elif op == 0x30:                          # i64.load8_s
                a = st.pop() + imm
                if a >= len(mem):
                    raise WasmTrap("oob load")
                v = mem[a]
                st.append((v - 256 if v & 0x80 else v) & _M64)
            elif op == 0x31:                          # i64.load8_u
                a = st.pop() + imm
                if a >= len(mem):
                    raise WasmTrap("oob load")
                st.append(mem[a])
            elif op == 0x32:                          # i64.load16_s
                a = st.pop() + imm
                if a + 2 > len(mem):
                    raise WasmTrap("oob load")
                v = int.from_bytes(mem[a:a + 2], "little")
                st.append((v - 65536 if v & 0x8000 else v) & _M64)
            elif op == 0x33:                          # i64.load16_u
                a = st.pop() + imm
                if a + 2 > len(mem):
                    raise WasmTrap("oob load")
                st.append(int.from_bytes(mem[a:a + 2], "little"))
            elif op == 0x34:                          # i64.load32_s
                a = st.pop() + imm
                if a + 4 > len(mem):
                    raise WasmTrap("oob load")
                v = int.from_bytes(mem[a:a + 4], "little")
                st.append((v - (1 << 32) if v & 0x80000000 else v) & _M64)
            elif op == 0x35:                          # i64.load32_u
                a = st.pop() + imm
                if a + 4 > len(mem):
                    raise WasmTrap("oob load")
                st.append(int.from_bytes(mem[a:a + 4], "little"))
            elif op == 0x3C:                          # i64.store8
                v, a = st.pop(), st.pop() + imm
                if a >= len(mem):
                    raise WasmTrap("oob store")
                mem[a] = v & 0xFF
            elif op == 0x3D:                          # i64.store16
                v, a = st.pop(), st.pop() + imm
                if a + 2 > len(mem):
                    raise WasmTrap("oob store")
                mem[a:a + 2] = (v & 0xFFFF).to_bytes(2, "little")
            elif op == 0x3E:                          # i64.store32
                v, a = st.pop(), st.pop() + imm
                if a + 4 > len(mem):
                    raise WasmTrap("oob store")
                mem[a:a + 4] = (v & _M32).to_bytes(4, "little")
            # -- sign-extension ops (Rust sign_ext feature, on by default) --
            elif op == 0xC0:                          # i32.extend8_s
                v = st.pop() & 0xFF
                st.append((v - 256 if v & 0x80 else v) & _M32)
            elif op == 0xC1:                          # i32.extend16_s
                v = st.pop() & 0xFFFF
                st.append((v - 65536 if v & 0x8000 else v) & _M32)
            elif op == 0xC2:                          # i64.extend8_s
                v = st.pop() & 0xFF
                st.append((v - 256 if v & 0x80 else v) & _M64)
            elif op == 0xC3:                          # i64.extend16_s
                v = st.pop() & 0xFFFF
                st.append((v - 65536 if v & 0x8000 else v) & _M64)
            elif op == 0xC4:                          # i64.extend32_s
                v = st.pop() & _M32
                st.append((v - (1 << 32) if v & 0x80000000 else v) & _M64)
            # -- floats -----------------------------------------------------
            elif op == 0x2A:                          # f32.load
                a = st.pop() + imm
                if a + 4 > len(mem):
                    raise WasmTrap("oob load")
                st.append(struct.unpack("<f", mem[a:a + 4])[0])
            elif op == 0x2B:                          # f64.load
                a = st.pop() + imm
                if a + 8 > len(mem):
                    raise WasmTrap("oob load")
                st.append(struct.unpack("<d", mem[a:a + 8])[0])
            elif op == 0x38:                          # f32.store
                v, a = st.pop(), st.pop() + imm
                if a + 4 > len(mem):
                    raise WasmTrap("oob store")
                mem[a:a + 4] = struct.pack("<f", _f32(float(v)))
            elif op == 0x39:                          # f64.store
                v, a = st.pop(), st.pop() + imm
                if a + 8 > len(mem):
                    raise WasmTrap("oob store")
                mem[a:a + 8] = struct.pack("<d", float(v))
            elif 0x5B <= op <= 0x60:                  # f32 comparisons
                b, a = st.pop(), st.pop()
                st.append(_FCMP[op - 0x5B](float(a), float(b)))
            elif 0x61 <= op <= 0x66:                  # f64 comparisons
                b, a = st.pop(), st.pop()
                st.append(_FCMP[op - 0x61](float(a), float(b)))
            elif 0x8B <= op <= 0x91:                  # f32 unary
                st.append(_f32(_FUNOP[op - 0x8B](float(st.pop()))))
            elif 0x92 <= op <= 0x98:                  # f32 binary
                b, a = st.pop(), st.pop()
                st.append(_f32(_FBINOP[op - 0x92](float(a), float(b))))
            elif 0x99 <= op <= 0x9F:                  # f64 unary
                st.append(_FUNOP[op - 0x99](float(st.pop())))
            elif 0xA0 <= op <= 0xA6:                  # f64 binary
                b, a = st.pop(), st.pop()
                st.append(_FBINOP[op - 0xA0](float(a), float(b)))
            elif op == 0xA8:                          # i32.trunc_f32_s
                st.append(_trunc_checked(float(st.pop()), -(1 << 31),
                                         (1 << 31) - 1, "i32") & _M32)
            elif op == 0xA9:                          # i32.trunc_f32_u
                st.append(_trunc_checked(float(st.pop()), 0, _M32, "u32"))
            elif op == 0xAA:                          # i32.trunc_f64_s
                st.append(_trunc_checked(float(st.pop()), -(1 << 31),
                                         (1 << 31) - 1, "i32") & _M32)
            elif op == 0xAB:                          # i32.trunc_f64_u
                st.append(_trunc_checked(float(st.pop()), 0, _M32, "u32"))
            elif op == 0xAE:                          # i64.trunc_f32_s
                st.append(_trunc_checked(float(st.pop()), -(1 << 63),
                                         (1 << 63) - 1, "i64") & _M64)
            elif op == 0xAF:                          # i64.trunc_f32_u
                st.append(_trunc_checked(float(st.pop()), 0, _M64, "u64"))
            elif op == 0xB0:                          # i64.trunc_f64_s
                st.append(_trunc_checked(float(st.pop()), -(1 << 63),
                                         (1 << 63) - 1, "i64") & _M64)
            elif op == 0xB1:                          # i64.trunc_f64_u
                st.append(_trunc_checked(float(st.pop()), 0, _M64, "u64"))
            elif op == 0xB2:                          # f32.convert_i32_s
                st.append(_f32(float(_s32(st.pop()))))
            elif op == 0xB3:                          # f32.convert_i32_u
                st.append(_f32(float(st.pop() & _M32)))
            elif op == 0xB4:                          # f32.convert_i64_s
                st.append(_f32(float(_s64(st.pop()))))
            elif op == 0xB5:                          # f32.convert_i64_u
                st.append(_f32(float(st.pop() & _M64)))
            elif op == 0xB6:                          # f32.demote_f64
                st.append(_f32(float(st.pop())))
            elif op == 0xB7:                          # f64.convert_i32_s
                st.append(float(_s32(st.pop())))
            elif op == 0xB8:                          # f64.convert_i32_u
                st.append(float(st.pop() & _M32))
            elif op == 0xB9:                          # f64.convert_i64_s
                st.append(float(_s64(st.pop())))
            elif op == 0xBA:                          # f64.convert_i64_u
                st.append(float(st.pop() & _M64))
            elif op == 0xBB:                          # f64.promote_f32
                st.append(float(st.pop()))
            elif op == 0xBC:                          # i32.reinterpret_f32
                st.append(struct.unpack("<I", struct.pack("<f", _f32(float(st.pop()))))[0])
            elif op == 0xBD:                          # i64.reinterpret_f64
                st.append(struct.unpack("<Q", struct.pack("<d", float(st.pop())))[0])
            elif op == 0xBE:                          # f32.reinterpret_i32
                st.append(struct.unpack("<f", struct.pack("<I", st.pop() & _M32))[0])
            elif op == 0xBF:                          # f64.reinterpret_i64
                st.append(struct.unpack("<d", struct.pack("<Q", st.pop() & _M64))[0])
            elif op == 0xFC and 0 <= imm <= 7:        # trunc_sat (Rust casts)
                v = float(st.pop())
                if imm == 0:
                    st.append(_trunc_sat(v, -(1 << 31), (1 << 31) - 1) & _M32)
                elif imm == 1:
                    st.append(_trunc_sat(v, 0, _M32))
                elif imm == 2:
                    st.append(_trunc_sat(v, -(1 << 31), (1 << 31) - 1) & _M32)
                elif imm == 3:
                    st.append(_trunc_sat(v, 0, _M32))
                elif imm == 4:
                    st.append(_trunc_sat(v, -(1 << 63), (1 << 63) - 1) & _M64)
                elif imm == 5:
                    st.append(_trunc_sat(v, 0, _M64))
                elif imm == 6:
                    st.append(_trunc_sat(v, -(1 << 63), (1 << 63) - 1) & _M64)
                else:
                    st.append(_trunc_sat(v, 0, _M64))
            else:
                raise WasmTrap(f"unsupported opcode {op:#x} "
                               f"(SIMD, reference-type/table-mutation ops "
                               f"and multi-value are outside the built-in "
                               f"interpreter's subset; install wasmtime)")
            pc += 1
        return st

    def _func_type(self, func_idx: int) -> tuple[bytes, bytes]:
        n_imp = self.m.n_imported_funcs()
        if func_idx < n_imp:
            return self.m.types[self.m.imports[func_idx].type_idx]
        return self.m.types[self.m.funcs[func_idx - n_imp].type_idx]

    @staticmethod
    def _branch(label: int, ctrl: list, st: list) -> int:
        """Pop `label`+1 control entries, fix the value stack, and return the
        stored branch target (loop header, or past the block's end)."""
        is_loop, target_pc, arity, base = ctrl[-1 - label]
        keep = st[len(st) - arity:] if arity and not is_loop else []
        del st[base:]
        st.extend(keep)
        del ctrl[len(ctrl) - 1 - label:]
        return target_pc


def _mask_div_s32(a, b):
    if b == 0:
        raise WasmTrap("i32 division by zero")
    q = abs(_s32(a)) // abs(_s32(b))
    if (_s32(a) < 0) != (_s32(b) < 0):
        q = -q
    return q & _M32


def _mask_rem_s32(a, b):
    if b == 0:
        raise WasmTrap("i32 remainder by zero")
    r = abs(_s32(a)) % abs(_s32(b))
    return (-r if _s32(a) < 0 else r) & _M32


_CMP32 = {
    0x46: lambda a, b: 1 if a == b else 0,
    0x47: lambda a, b: 1 if a != b else 0,
    0x48: lambda a, b: 1 if _s32(a) < _s32(b) else 0,
    0x49: lambda a, b: 1 if a < b else 0,
    0x4A: lambda a, b: 1 if _s32(a) > _s32(b) else 0,
    0x4B: lambda a, b: 1 if a > b else 0,
    0x4C: lambda a, b: 1 if _s32(a) <= _s32(b) else 0,
    0x4D: lambda a, b: 1 if a <= b else 0,
    0x4E: lambda a, b: 1 if _s32(a) >= _s32(b) else 0,
    0x4F: lambda a, b: 1 if a >= b else 0,
}

_CMP64 = {
    0x51: lambda a, b: 1 if a == b else 0,
    0x52: lambda a, b: 1 if a != b else 0,
    0x53: lambda a, b: 1 if _s64(a) < _s64(b) else 0,
    0x54: lambda a, b: 1 if a < b else 0,
    0x55: lambda a, b: 1 if _s64(a) > _s64(b) else 0,
    0x56: lambda a, b: 1 if a > b else 0,
    0x57: lambda a, b: 1 if _s64(a) <= _s64(b) else 0,
    0x58: lambda a, b: 1 if a <= b else 0,
    0x59: lambda a, b: 1 if _s64(a) >= _s64(b) else 0,
    0x5A: lambda a, b: 1 if a >= b else 0,
}

_ARITH32 = {
    0x6A: lambda a, b: (a + b) & _M32,
    0x6B: lambda a, b: (a - b) & _M32,
    0x6C: lambda a, b: (a * b) & _M32,
    0x6D: _mask_div_s32,
    0x6E: lambda a, b: (a // b) & _M32 if b else _trap("i32 div by zero"),
    0x6F: _mask_rem_s32,
    0x70: lambda a, b: (a % b) & _M32 if b else _trap("i32 rem by zero"),
    0x71: lambda a, b: a & b,
    0x72: lambda a, b: a | b,
    0x73: lambda a, b: a ^ b,
    0x74: lambda a, b: (a << (b & 31)) & _M32,
    0x75: lambda a, b: (_s32(a) >> (b & 31)) & _M32,
    0x76: lambda a, b: a >> (b & 31),
    0x77: lambda a, b: ((a << (b & 31)) | (a >> (32 - (b & 31)) if b & 31 else 0)) & _M32,
    0x78: lambda a, b: ((a >> (b & 31)) | (a << (32 - (b & 31)) if b & 31 else 0)) & _M32,
}


def _mask_div_s64(a, b):
    if b == 0:
        raise WasmTrap("i64 division by zero")
    q = abs(_s64(a)) // abs(_s64(b))
    if (_s64(a) < 0) != (_s64(b) < 0):
        q = -q
    return q & _M64


_ARITH64 = {
    0x7C: lambda a, b: (a + b) & _M64,
    0x7D: lambda a, b: (a - b) & _M64,
    0x7E: lambda a, b: (a * b) & _M64,
    0x7F: _mask_div_s64,
    0x80: lambda a, b: (a // b) & _M64 if b else _trap("i64 div by zero"),
    0x81: lambda a, b: ((abs(_s64(a)) % abs(_s64(b))) * (-1 if _s64(a) < 0 else 1)) & _M64 if b else _trap("i64 rem by zero"),
    0x82: lambda a, b: (a % b) & _M64 if b else _trap("i64 rem by zero"),
    0x83: lambda a, b: a & b,
    0x84: lambda a, b: a | b,
    0x85: lambda a, b: a ^ b,
    0x86: lambda a, b: (a << (b & 63)) & _M64,
    0x87: lambda a, b: (_s64(a) >> (b & 63)) & _M64,
    0x88: lambda a, b: a >> (b & 63),
    0x89: lambda a, b: ((a << (b & 63)) | (a >> (64 - (b & 63)) if b & 63 else 0)) & _M64,
    0x8A: lambda a, b: ((a >> (b & 63)) | (a << (64 - (b & 63)) if b & 63 else 0)) & _M64,
}


def _trap(msg: str):
    raise WasmTrap(msg)


# -- float support (F32/F64 numeric subset) ---------------------------------
#
# Values live on the stack as Python floats (doubles); every f32 op rounds
# its result through IEEE binary32 (`_f32`) so single-precision semantics
# hold.  Rust-built transformer modules (the reference's examples/wasm)
# reach float ops even for string work via SIMD-lowered libm/memcpy paths,
# and Rust float→int casts emit the 0xFC saturating truncations.

import math as _math


def _f32(v: float) -> float:
    """Round a Python double to IEEE binary32 (overflow → ±inf)."""
    try:
        return struct.unpack("<f", struct.pack("<f", v))[0]
    except OverflowError:
        return _math.inf if v > 0 else -_math.inf


def _fnearest(v: float) -> float:
    """round-to-nearest, ties-to-even (WASM `nearest`)."""
    if _math.isnan(v) or _math.isinf(v):
        return v
    r = round(v)  # Python rounds half to even
    return float(r)


def _fmin(a: float, b: float) -> float:
    if _math.isnan(a) or _math.isnan(b):
        return _math.nan
    if a == b == 0.0:  # -0.0 < +0.0 per WASM min
        return -0.0 if (_math.copysign(1, a) < 0 or _math.copysign(1, b) < 0) else 0.0
    return min(a, b)


def _fmax(a: float, b: float) -> float:
    if _math.isnan(a) or _math.isnan(b):
        return _math.nan
    if a == b == 0.0:
        return 0.0 if (_math.copysign(1, a) > 0 or _math.copysign(1, b) > 0) else -0.0
    return max(a, b)


def _fdiv(a: float, b: float) -> float:
    if b == 0.0:
        if _math.isnan(a) or a == 0.0:
            return _math.nan
        return _math.copysign(_math.inf, a) * _math.copysign(1.0, b)
    return a / b


_FCMP = {  # f32 0x5B-0x60 and f64 0x61-0x66 share semantics
    0: lambda a, b: 1 if a == b else 0,
    1: lambda a, b: 1 if a != b else 0,
    2: lambda a, b: 1 if a < b else 0,
    3: lambda a, b: 1 if a > b else 0,
    4: lambda a, b: 1 if a <= b else 0,
    5: lambda a, b: 1 if a >= b else 0,
}

_FUNOP = {  # shared by f32 (0x8B..0x91) and f64 (0x99..0x9F), offset order
    0: abs,                                   # abs
    1: lambda v: -v,                          # neg
    2: lambda v: v if _math.isnan(v) or _math.isinf(v) else float(_math.ceil(v)),
    3: lambda v: v if _math.isnan(v) or _math.isinf(v) else float(_math.floor(v)),
    4: lambda v: v if _math.isnan(v) or _math.isinf(v) else float(_math.trunc(v)),
    5: _fnearest,                             # nearest
    6: lambda v: _math.sqrt(v) if v >= 0 else _math.nan,  # sqrt
}

_FBINOP = {  # shared by f32 (0x92..0x98) and f64 (0xA0..0xA6), offset order
    0: lambda a, b: a + b,
    1: lambda a, b: a - b,
    2: lambda a, b: a * b,
    3: _fdiv,
    4: _fmin,
    5: _fmax,
    6: lambda a, b: _math.copysign(a, b),     # copysign
}


def _trunc_checked(v: float, lo: int, hi: int, what: str) -> int:
    if _math.isnan(v):
        raise WasmTrap(f"invalid conversion to {what}: NaN")
    t = _math.trunc(v) if not _math.isinf(v) else (lo - 1 if v < 0 else hi + 1)
    if t < lo or t > hi:
        raise WasmTrap(f"{what} trunc overflow")
    return int(t)


def _trunc_sat(v: float, lo: int, hi: int) -> int:
    if _math.isnan(v):
        return 0
    if _math.isinf(v):
        return lo if v < 0 else hi
    t = _math.trunc(v)
    return int(min(max(t, lo), hi))


# ---------------------------------------------------------------------------
# runtime selection + Spark integration
# ---------------------------------------------------------------------------


def _have_wasmtime() -> bool:
    try:
        import wasmtime  # noqa: F401
        return True
    except ImportError:
        return False


@lru_cache(maxsize=16)
def _parsed_module(wasm_bytes: bytes) -> WasmModule:
    return WasmModule(wasm_bytes)


def wasi_run(wasm_bytes: bytes, stdin: bytes) -> bytes:
    """Run a WASI command module: stdin in, stdout out (fresh instance).

    Uses wasmtime when importable (full spec); otherwise the built-in
    interpreter, whose subset covers MVP integer/float ops, sign-extension,
    trunc-sat, funcref tables/call_indirect and the WASI stdio imports —
    enough to run the reference's Rust-built example module.  Unsupported:
    SIMD, reference-type/table-mutation ops, multi-value."""
    if _have_wasmtime():
        return _wasmtime_run(wasm_bytes, stdin)
    return _parsed_module(wasm_bytes).run_wasi(stdin)


def _wasmtime_run(wasm_bytes: bytes, stdin: bytes) -> bytes:
    """wasmtime path — per-call Store (instances must not share state);
    module compilation cached per process via lru_cache on bytes."""
    import os
    import tempfile

    import wasmtime

    eng = _wasmtime_engine()
    module = _wasmtime_module(eng, wasm_bytes)
    with tempfile.TemporaryDirectory(prefix="rs_wasi_") as td:
        in_path = os.path.join(td, "in")
        out_path = os.path.join(td, "out")
        with open(in_path, "wb") as fh:
            fh.write(stdin)
        cfg = wasmtime.WasiConfig()
        cfg.stdin_file = in_path
        cfg.stdout_file = out_path
        store = wasmtime.Store(eng)
        store.set_wasi(cfg)
        linker = wasmtime.Linker(eng)
        linker.define_wasi()
        inst = linker.instantiate(store, module)
        start = inst.exports(store)["_start"]
        try:
            start(store)
        except wasmtime.ExitTrap as e:  # type: ignore[attr-defined]
            if getattr(e, "code", 0) not in (0, None):
                raise
        with open(out_path, "rb") as fh:
            return fh.read()


@lru_cache(maxsize=1)
def _wasmtime_engine():
    import wasmtime
    return wasmtime.Engine()


@lru_cache(maxsize=16)
def _wasmtime_module(eng, wasm_bytes: bytes):
    import wasmtime
    return wasmtime.Module(eng, wasm_bytes)


def wasm_transform_values(wasm_bytes: bytes, values):
    """Map each value through the module with the reference's stdio contract:
    value + newline to stdin, _start, trimmed stdout back
    (custom_wasm.rs:66-99).  None passes through untouched."""
    out = []
    for v in values:
        if v is None:
            out.append(None)
            continue
        res = wasi_run(wasm_bytes, str(v).encode("utf-8") + b"\n")
        out.append(res.decode("utf-8").strip())
    return out


def wasm_transformer(wasm_path: str, return_type: str = "string"):
    """Arrow-batched pandas UDF running a user's .wasm transformer.

    The module BYTES are captured in the closure (broadcast with the task),
    parsed/compiled once per executor process (lru_cache), instantiated per
    value like the reference.  Per-value stdio is inherently the slow path —
    `custom_pandas_transformer` is the native-speed alternative — but an
    existing .wasm asset runs unmodified."""
    import pandas as pd
    from pyspark.sql import functions as F

    with open(wasm_path, "rb") as fh:
        wasm_bytes = fh.read()
    if not _have_wasmtime():
        _parsed_module(wasm_bytes)                    # fail fast on the driver

    def _batch(s):
        return pd.Series(wasm_transform_values(wasm_bytes, s), index=s.index)

    return F.pandas_udf(_batch, return_type)
