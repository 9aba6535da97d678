"""TPU rANS engine: device state-walks + host table prep/framing.

Produces bit-identical rANS 32x16 payloads to the native/reference
codec.  The host (C++ helpers) builds/parses frequency tables and does
the byte-level framing; the per-symbol O(n) loop runs on the device as
batched `lax.scan`s over (B, 32) state matrices (ops/rans_jax.py).

Layout recap (rANS_static32x16pr.c):
- order-0: symbol p -> lane p%32, walked 32 at a time; the <32-byte
  remainder maps to lanes 0..rem-1 and is encoded first (here: one
  masked trailing scan step using a no-op sentinel symbol).
- order-1: lane z owns the contiguous chunk [z*isz,(z+1)*isz);
  pairs are (ctx=prev byte, sym=byte), each chunk's first byte coded
  with ctx 0; the tail (>= 32*isz) belongs to lane 31 and is walked on
  the host before/after the scan (a few bytes at most).
"""

from __future__ import annotations

import ctypes

import numpy as np

from fqzcomp5_tpu.codecs import native
from fqzcomp5_tpu.ops import rans_jax

_u8p = ctypes.POINTER(ctypes.c_uint8)
_u32p = ctypes.POINTER(ctypes.c_uint32)


def _lib():
    L = native.lib()
    if not hasattr(L, "_prep_registered"):
        L.fqz5_rans_o0_prep.restype = ctypes.c_int64
        L.fqz5_rans_o0_prep.argtypes = [
            _u8p, ctypes.c_uint32, _u8p, ctypes.c_uint32, _u32p]
        L.fqz5_rans_o0_dec_prep.restype = ctypes.c_int64
        L.fqz5_rans_o0_dec_prep.argtypes = [_u8p, ctypes.c_uint32, _u32p]
        L.fqz5_rans_o1_prep.restype = ctypes.c_int64
        L.fqz5_rans_o1_prep.argtypes = [
            _u8p, ctypes.c_uint32, ctypes.c_int, _u8p, ctypes.c_uint32,
            _u32p, ctypes.POINTER(ctypes.c_int)]
        L.fqz5_rans_o1_dec_prep.restype = ctypes.c_int64
        L.fqz5_rans_o1_dec_prep.argtypes = [
            _u8p, ctypes.c_uint32, _u32p, ctypes.POINTER(ctypes.c_int)]
        L._prep_registered = True
    return L


def _ptr(arr):
    return arr.ctypes.data_as(_u8p)


# ---------------------------------------------------------------------
# host table prep

def o0_prep(data: bytes):
    L = _lib()
    arr = np.frombuffer(data, np.uint8)
    tab = np.empty(2048, np.uint8)
    freqs = np.empty(256, np.uint32)
    n = L.fqz5_rans_o0_prep(_ptr(arr), len(data), _ptr(tab), 2048,
                            freqs.ctypes.data_as(_u32p))
    if n < 0:
        raise ValueError("o0 prep failed")
    return tab[:n].tobytes(), freqs


def o1_prep(data: bytes, nway: int = 32):
    L = _lib()
    arr = np.frombuffer(data, np.uint8)
    cap = 257 * 257 * 3 + 1024
    tab = np.empty(cap, np.uint8)
    freqs = np.empty(256 * 256, np.uint32)
    shift = ctypes.c_int(0)
    n = L.fqz5_rans_o1_prep(_ptr(arr), len(data), nway, _ptr(tab), cap,
                            freqs.ctypes.data_as(_u32p),
                            ctypes.byref(shift))
    if n < 0:
        raise ValueError("o1 prep failed")
    return tab[:n].tobytes(), freqs.reshape(256, 256), shift.value


# ---------------------------------------------------------------------
# Order-0 core (table + 32-way stream)

def encode_o0_core(data: bytes) -> bytes:
    if len(data) == 0:
        return b""
    tab, freqs = o0_prep(data)
    x_max, rcp, rcp_shift, bias, cmpl = rans_jax.build_enc_tables(
        freqs, rans_jax.TF_SHIFT)

    def with_nop(a, v):
        return np.concatenate([a, np.array([v], a.dtype)])
    x_max = with_nop(x_max, 0xFFFFFFFF)
    rcp = with_nop(rcp, 0)
    rcp_shift = with_nop(rcp_shift, 0)
    bias = with_nop(bias, 0)
    cmpl = with_nop(cmpl, 0)

    arr = np.frombuffer(data, np.uint8)
    n = len(arr)
    T = n // 32
    rem = n - T * 32
    main = arr[:T * 32].reshape(T, 32).astype(np.int32)
    if rem:
        pad = np.full((1, 32), 256, np.int32)
        pad[0, :rem] = arr[T * 32:]
        main = np.concatenate([main, pad], axis=0)

    Rf, words, mask = rans_jax.encode_scan(
        main[None], x_max[None], rcp[None], rcp_shift[None], bias[None],
        cmpl[None], rans_jax.TF_SHIFT)
    return tab + rans_jax.assemble_o0_stream(
        np.asarray(Rf)[0], np.asarray(words)[0], np.asarray(mask)[0])


def decode_o0_core(payload: bytes, out_sz: int) -> bytes:
    L = _lib()
    arr = np.frombuffer(payload, np.uint8)
    s3 = np.empty(1 << 12, np.uint32)
    used = L.fqz5_rans_o0_dec_prep(_ptr(arr), len(arr),
                                   s3.ctypes.data_as(_u32p))
    if used < 0:
        raise ValueError("o0 dec prep failed")
    body = arr[used:]
    R0 = body[:128].copy().view("<u4").astype(np.uint32)
    words = body[128:]
    if len(words) & 1:
        words = np.concatenate([words, np.zeros(1, np.uint8)])
    words = words.copy().view("<u2").astype(np.uint32)
    if words.size == 0:
        words = np.zeros(1, np.uint32)

    T = out_sz // 32
    rem = out_sz - T * 32
    syms, Rf, _ = rans_jax.decode_scan(words[None], R0[None], s3[None], T)
    out = np.asarray(syms)[0].reshape(-1).astype(np.uint8)
    if rem:
        Rfin = np.asarray(Rf)[0]
        tail = (s3[Rfin[:rem] & rans_jax.MASK12] & 0xFF).astype(np.uint8)
        out = np.concatenate([out, tail])
    return out[:out_sz].tobytes()


# ---------------------------------------------------------------------
# Order-1 core

def _host_put(R: int, l: int, c_ctx: int, sym: int, flat, shift: int,
              words: list) -> tuple[int, int]:
    """One reference RansEncPutSymbol on the host (tail bytes)."""
    x_max, rcp, rcp_shift, bias, cmpl = flat
    idx = c_ctx * 256 + sym
    if R > int(x_max[idx]):
        words.append(R & 0xFFFF)
        R >>= 16
    q = (R * int(rcp[idx])) >> (32 + int(rcp_shift[idx]))
    R = (R + int(bias[idx]) + q * int(cmpl[idx])) & 0xFFFFFFFF
    return R, sym


def _o1_planes(arr: np.ndarray, isz: int):
    chunks = arr[:32 * isz].reshape(32, isz)
    syms = np.empty((isz, 32), np.int32)
    ctxs = np.empty((isz, 32), np.int32)
    syms[1:, :] = chunks.T[1:]
    ctxs[1:, :] = chunks.T[:-1]
    syms[0, :] = chunks.T[0]
    ctxs[0, :] = 0
    return syms, ctxs


def encode_o1_core(data: bytes) -> bytes:
    n = len(data)
    if n < 32:
        raise ValueError("O1 32-way needs >= 32 bytes")
    tab, freqs, shift = o1_prep(data)
    x_max, rcp, rcp_shift, bias, cmpl = rans_jax.build_enc_tables(
        freqs, shift)
    flat = (x_max.reshape(-1), rcp.reshape(-1), rcp_shift.reshape(-1),
            bias.reshape(-1), cmpl.reshape(-1))

    arr = np.frombuffer(data, np.uint8)
    isz = n // 32

    # lane 31's tail walk (emitted first => highest stream addresses)
    R31 = rans_jax.RANS_L
    tail_words: list[int] = []
    lsym = int(arr[n - 1])
    for i in range(n - 2, 32 * isz - 2, -1):
        R31, lsym = _host_put(R31, lsym, int(arr[i]), lsym, flat, shift,
                              tail_words)
        lsym = int(arr[i])

    syms, ctxs = _o1_planes(arr, isz)
    R0 = np.full(32, rans_jax.RANS_L, np.uint32)
    R0[31] = R31

    Rf, words, mask = rans_jax.encode_scan_o1(
        syms[None], ctxs[None],  # (1, T, 32)
        flat[0][None], flat[1][None], flat[2][None], flat[3][None],
        flat[4][None], shift, R0[None])
    Rf = np.asarray(Rf)[0]
    w = np.asarray(words)[0].reshape(-1)
    m = np.asarray(mask)[0].reshape(-1)
    stream = (Rf.astype("<u4").tobytes()
              + w[m].astype("<u2").tobytes()
              + np.array(tail_words[::-1], "<u2").tobytes())
    return tab + stream


def decode_o1_core(payload: bytes, out_sz: int) -> bytes:
    L = _lib()
    arr = np.frombuffer(payload, np.uint8)
    shift_c = ctypes.c_int(0)
    s3 = np.empty(256 << 12, np.uint32)  # max size; shift may be 10
    used = L.fqz5_rans_o1_dec_prep(_ptr(arr), len(arr),
                                   s3.ctypes.data_as(_u32p),
                                   ctypes.byref(shift_c))
    if used < 0:
        raise ValueError("o1 dec prep failed")
    shift = shift_c.value
    tot = 1 << shift
    s3 = s3[:256 * tot]

    body = arr[used:]
    R0 = body[:128].copy().view("<u4").astype(np.uint32)
    words = body[128:]
    if len(words) & 1:
        words = np.concatenate([words, np.zeros(1, np.uint8)])
    words = words.copy().view("<u2").astype(np.uint32)
    if words.size == 0:
        words = np.zeros(1, np.uint32)

    isz = out_sz // 32
    syms, Rf, ptrf = rans_jax.decode_scan_o1(
        words[None], R0[None], s3[None], isz, shift)
    # (isz, 32) -> chunks are columns
    out = np.asarray(syms)[0].T.reshape(-1).astype(np.uint8)

    # tail: lane 31 continues on the host
    rem = out_sz - 32 * isz
    if rem:
        R = int(np.asarray(Rf)[0][31])
        ptr = int(np.asarray(ptrf)[0])
        mask = tot - 1
        last = int(out[-1]) if isz else 0
        tail = np.empty(rem, np.uint8)
        for k in range(rem):
            m = R & mask
            S = int(s3[last * tot + m])
            c = S & 0xFF
            R = (S >> (shift + 8)) * (R >> shift) + ((S >> 8) & mask)
            if R < rans_jax.RANS_L and ptr < len(words):
                R = ((R << 16) | int(words[ptr])) & 0xFFFFFFFF
                ptr += 1
            tail[k] = c
            last = c
        out = np.concatenate([out, tail])
    return out[:out_sz].tobytes()
