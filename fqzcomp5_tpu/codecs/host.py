"""High-level Python API over the native engine for every FQZ5 codec.

Each function is bytes-in/bytes-out and mirrors a reference entry point:
rans (rans_compress_to_4x16), seq (encode_seq), fqz (fqz_compress),
lzp (lzp16e), arith (arith_compress_to), tok3 (tok3_encode_names).
"""

from __future__ import annotations

import ctypes

import numpy as np

from fqzcomp5_tpu.codecs import native
from fqzcomp5_tpu.codecs.native import rans_compress, rans_uncompress  # noqa: F401

_u8p = ctypes.POINTER(ctypes.c_uint8)


def _ptr(buf):
    if len(buf) == 0:
        return ctypes.cast(1, _u8p), np.zeros(0, np.uint8)
    arr = np.frombuffer(buf, np.uint8) if not isinstance(buf, np.ndarray) \
        else buf
    return arr.ctypes.data_as(_u8p), arr


def _out(cap: int):
    return native.out_scratch(cap)


def seq_encode(seq_buf: bytes, lens, both_strands: int, ctx_size: int) -> bytes:
    L = native.lib()
    lens_arr = np.ascontiguousarray(lens, np.uint32)
    cap = len(seq_buf) + 100
    out, outp = _out(cap)
    inp, _keep = _ptr(seq_buf)
    rc = L.fqz5_seq_encode(
        inp, len(seq_buf),
        lens_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        len(lens_arr), both_strands, ctx_size, outp, cap)
    if rc < 0:
        raise ValueError("seq_encode failed")
    return out[:rc].tobytes()


def seq_decode(comp: bytes, lens, both_strands: int, ctx_size: int,
               out_size: int) -> bytes:
    L = native.lib()
    lens_arr = np.ascontiguousarray(lens, np.uint32)
    out, outp = _out(out_size)
    inp, _keep = _ptr(comp)
    rc = L.fqz5_seq_decode(
        inp, len(comp),
        lens_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        len(lens_arr), both_strands, ctx_size, outp, out_size)
    if rc < 0:
        raise ValueError("seq_decode failed")
    return out[:out_size].tobytes()


def fqz_compress(qual: bytes, lens, flags, seq_buf: bytes | None,
                 strat: int) -> bytes:
    """Compress qualities (already rebased to q-33)."""
    L = native.lib()
    lens_arr = np.ascontiguousarray(lens, np.uint32)
    flags_arr = np.array(flags, np.uint32)  # mutated by stats; pass a copy
    cap = int(len(qual) * 1.1) + 100000
    out, outp = _out(cap)
    inp, _keep = _ptr(qual)
    if seq_buf is None:
        seqp = ctypes.cast(0, _u8p)
        _keep2 = None
    else:
        seqp, _keep2 = _ptr(seq_buf)
    rc = L.fqz5_fqz_compress(
        inp, len(qual),
        lens_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        flags_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        seqp, len(lens_arr), strat, outp, cap)
    if rc < 0:
        raise ValueError("fqz_compress failed")
    return out[:rc].tobytes()


def fqz_decompress(comp: bytes, out_size: int,
                   seq_buf: bytes | None = None) -> bytes:
    L = native.lib()
    out, outp = _out(out_size)
    inp, _keep = _ptr(comp)
    if seq_buf is None:
        seqp = ctypes.cast(0, _u8p)
        _keep2 = None
    else:
        seqp, _keep2 = _ptr(seq_buf)
    rc = L.fqz5_fqz_decompress(inp, len(comp), outp, out_size, seqp)
    if rc < 0:
        raise ValueError("fqz_decompress failed")
    return out[:rc].tobytes()


def lzp(data: bytes) -> bytes:
    L = native.lib()
    cap = len(data) * 2 + 1024
    out, outp = _out(cap)
    inp, _keep = _ptr(data)
    rc = L.fqz5_lzp(inp, len(data), outp, cap)
    if rc < 0:
        raise ValueError("lzp failed")
    return out[:rc].tobytes()


def unlzp(data: bytes, out_size: int) -> bytes:
    L = native.lib()
    out, outp = _out(out_size + 1024)
    inp, _keep = _ptr(data)
    rc = L.fqz5_unlzp(inp, len(data), outp, out_size + 1024)
    if rc < 0:
        raise ValueError("unlzp failed")
    return out[:rc].tobytes()


def arith_compress(data: bytes, order: int) -> bytes:
    L = native.lib()
    cap = int(1.05 * len(data)) + 257 * 257 * 3 + 1024
    out, outp = _out(cap)
    inp, _keep = _ptr(data)
    rc = L.fqz5_arith_compress(inp, len(data), order, outp, cap)
    if rc < 0:
        raise ValueError("arith_compress failed")
    return out[:rc].tobytes()


def arith_uncompress(data: bytes) -> bytes:
    from fqzcomp5_tpu.utils import varint

    L = native.lib()
    if data[0] & 0x10:
        raise ValueError("NOSZ arith stream needs explicit size")
    osz, _ = varint.get_u32(data, 1)
    out, outp = _out(osz + 64)
    inp, _keep = _ptr(data)
    rc = L.fqz5_arith_uncompress(inp, len(data), outp, osz + 64)
    if rc < 0:
        raise ValueError("arith_uncompress failed")
    return out[:rc].tobytes()


def tok3_encode(names_blk: bytes, level: int, use_arith: int) -> bytes:
    """names_blk: \\0- or \\n-separated names, trailing separator included."""
    L = native.lib()
    cap = len(names_blk) * 2 + (1 << 16)
    out, outp = _out(cap)
    inp, _keep = _ptr(names_blk)
    rc = L.fqz5_tok3_encode(inp, len(names_blk), level, use_arith, outp, cap)
    if rc < 0:
        raise ValueError("tok3_encode failed")
    return out[:rc].tobytes()


def tok3_decode(comp: bytes, expected_len: int | None = None,
                max_len: int | None = None) -> bytes:
    """expected_len: the section's known uncompressed size (exact);
    max_len: an upper bound from the framing.  Either fails fast on a
    corrupt embedded length instead of decoding gigabytes."""
    L = native.lib()
    if len(comp) < 9:
        raise ValueError("short tok3 stream")
    ulen = int.from_bytes(comp[:4], "little")
    if expected_len is not None and ulen != expected_len:
        raise ValueError(
            f"tok3 length mismatch: stream says {ulen}, "
            f"section says {expected_len}")
    if max_len is not None and ulen > max_len:
        raise ValueError("tok3 length exceeds section bound")
    if expected_len is None and ulen > (1 << 28):
        raise ValueError("implausible tok3 uncompressed length")
    cap = ulen + 2048
    out, outp = _out(cap)
    inp, _keep = _ptr(comp)
    rc = L.fqz5_tok3_decode(inp, len(comp), outp, cap)
    if rc < 0:
        raise ValueError("tok3_decode failed")
    return out[:rc].tobytes()
