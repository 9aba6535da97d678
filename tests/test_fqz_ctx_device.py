"""Pass 1 of the fqz-qual device decomposition: per-byte context
planes computed on device must match the native codec's walk exactly
(fqz_update_ctx semantics incl. selectors, multi-param stab routing,
position/delta tables).  See docs/DEVICE_ADAPTIVE_CODECS.md."""

import ctypes

import numpy as np
import pytest

from fqzcomp5_tpu.codecs import native
from fqzcomp5_tpu.ops import fqz_ctx_jax

_u8p = ctypes.POINTER(ctypes.c_uint8)
_u32p = ctypes.POINTER(ctypes.c_uint32)

K_G_HAVE_STAB = 2  # native/fqzqual.cpp:30


def _reg():
    L = native.lib()
    if not hasattr(L, "_dump_reg"):
        L.fqz5_fqz_dump_ctx.restype = ctypes.c_int64
        L.fqz5_fqz_dump_ctx.argtypes = [
            _u8p, ctypes.c_uint64, _u32p, _u32p, ctypes.c_int,
            ctypes.c_int, _u32p, _u8p, _u32p, ctypes.c_uint64, _u32p,
            _u8p]
        L._dump_reg = True
    return L


def _dump(q, lens, flags, strat):
    L = _reg()
    total = len(q)
    nrec = len(lens)
    fl = np.array(flags, np.uint32)
    ctx = np.zeros(total, np.uint32)
    qm = np.zeros(total, np.uint8)
    par = np.zeros(400000, np.uint32)
    sels = np.zeros(nrec, np.uint32)
    qa = np.frombuffer(q, np.uint8)
    la = np.ascontiguousarray(lens, np.uint32)
    rc = L.fqz5_fqz_dump_ctx(
        qa.ctypes.data_as(_u8p), total, la.ctypes.data_as(_u32p),
        fl.ctypes.data_as(_u32p), nrec, strat,
        ctx.ctypes.data_as(_u32p), qm.ctypes.data_as(_u8p),
        par.ctypes.data_as(_u32p), len(par),
        sels.ctypes.data_as(_u32p), None)
    assert rc > 0
    return ctx, qm, fqz_ctx_jax.FqzParams.parse(par[:rc]), sels


def _device_ctx(q, lens, P, sels):
    nrec = len(lens)
    pidx = (P.stab[sels] if (P.gflags & K_G_HAVE_STAB)
            else sels).astype(np.int32)
    Lmax = int(max(lens))
    quals = np.zeros((nrec, Lmax), np.uint8)
    qa = np.frombuffer(q, np.uint8)
    off = 0
    for r in range(nrec):
        ln = int(lens[r])
        quals[r, :ln] = qa[off:off + ln]
        off += ln
    cj, qj = fqz_ctx_jax.compute_contexts(
        quals, np.asarray(lens, np.uint32), pidx, sels,
        P.qmap, P.qtab, P.ptab, P.dtab,
        P.qshift, P.qmask, P.qloc, P.sloc, P.context)
    cj = np.asarray(cj)
    qj = np.asarray(qj)
    got_c = np.concatenate([cj[r, :int(lens[r])] for r in range(nrec)])
    got_q = np.concatenate([qj[r, :int(lens[r])] for r in range(nrec)])
    return got_c, got_q


def _case(kind, nrec=400):
    rng = np.random.default_rng(hash(kind) % 2**31)
    if kind == "fixed":
        lens = np.full(nrec, 100, np.uint32)
    else:
        lens = rng.integers(40, 180, nrec).astype(np.uint32)
    total = int(lens.sum())
    if kind == "binned":
        q = rng.choice(np.array([2, 12, 22, 37], np.uint8), total)
    else:
        q = np.clip(np.cumsum(rng.integers(-2, 3, total)) % 40 + 3,
                    0, 45).astype(np.uint8)
    flags = np.zeros(nrec, np.uint32)
    if kind == "r2":
        flags[1::2] = 128
    return bytes(q), lens, flags


@pytest.mark.parametrize("strat", [0, 1, 2, 3])
@pytest.mark.parametrize("kind", ["var", "fixed", "binned", "r2"])
def test_fqz_ctx_parity(strat, kind):
    q, lens, flags = _case(kind)
    ctx, qm, P, sels = _dump(q, lens, flags, strat)
    if (ctx == 0xFFFFFFFF).any():
        pytest.skip("dedup fired; pass-1 prototype skips dup records")
    got_c, got_q = _device_ctx(q, lens, P, sels)
    assert np.array_equal(got_q, qm)
    assert np.array_equal(got_c, ctx), kind
