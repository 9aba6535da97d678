"""Pass 2 of the fqz device decomposition: the vectorised per-context
AdaptiveModel evolution (ops/fqz_model_jax.py) must reproduce the
native model's (cum, freq, tot) triples exactly — including STEP
bumps, normalisation at (1<<16)-17 and the bubble reordering
(c_simple_model.h:117-138; native/rc.h AdaptiveModel).  See
docs/DEVICE_ADAPTIVE_CODECS.md."""

import ctypes

import numpy as np
import pytest

from fqzcomp5_tpu.codecs import native
from fqzcomp5_tpu.ops import fqz_model_jax

_u16p = ctypes.POINTER(ctypes.c_uint16)
_u32p = ctypes.POINTER(ctypes.c_uint32)


def _reg():
    L = native.lib()
    if not hasattr(L, "_replay_reg"):
        L.fqz5_adaptive_replay.restype = ctypes.c_int64
        L.fqz5_adaptive_replay.argtypes = [
            ctypes.c_int, ctypes.c_int, _u16p, ctypes.c_uint32,
            _u32p, _u32p, _u32p]
        L._replay_reg = True
    return L


def replay_native(max_sym, step, syms):
    L = _reg()
    n = len(syms)
    s = np.ascontiguousarray(syms, np.uint16)
    cum = np.zeros(n, np.uint32)
    freq = np.zeros(n, np.uint32)
    tot = np.zeros(n, np.uint32)
    rc = L.fqz5_adaptive_replay(
        max_sym, step, s.ctypes.data_as(_u16p), n,
        cum.ctypes.data_as(_u32p), freq.ctypes.data_as(_u32p),
        tot.ctypes.data_as(_u32p))
    assert rc == n
    return cum, freq, tot


def _compare(symplanes, counts, max_sym, step):
    symp = np.asarray(symplanes, np.int32)
    cnt = np.asarray(counts, np.int32)
    cums, freqs, tots = fqz_model_jax.evolve(
        symp, cnt, np.int32(max_sym), np.int32(step))
    cums, freqs, tots = map(np.asarray, (cums, freqs, tots))
    for c in range(symp.shape[0]):
        n = int(cnt[c])
        wc, wf, wt = replay_native(max_sym, step, symp[c, :n])
        assert np.array_equal(cums[c, :n], wc), f"cum ctx {c}"
        assert np.array_equal(freqs[c, :n], wf), f"freq ctx {c}"
        assert np.array_equal(tots[c, :n], wt), f"tot ctx {c}"


@pytest.mark.parametrize("step", [16, 8])
@pytest.mark.parametrize("max_sym,T", [
    (96, 500),      # fqz-qual shape, bubble-heavy early phase
    (4, 300),       # seq-literal shape
    (64, 4600),     # crosses the first normalisation (~4095 steps)
    (96, 9000),     # multiple normalisations
])
def test_model_evolution_uniform(step, max_sym, T):
    rng = np.random.default_rng(max_sym * 1000 + T + step)
    C = 6
    counts = rng.integers(1, T + 1, C).astype(np.int32)
    counts[0] = T
    symp = rng.integers(0, max_sym, (C, T)).astype(np.int32)
    _compare(symp, counts, max_sym, step)


def test_model_evolution_skewed():
    """Zipf-ish symbols exercise the bubble reordering constantly and
    push one frequency toward the normalisation bound fast."""
    rng = np.random.default_rng(7)
    C, T, max_sym = 5, 8192, 96
    z = rng.zipf(1.3, (C, T))
    symp = np.minimum(z - 1, max_sym - 1).astype(np.int32)
    counts = np.full(C, T, np.int32)
    _compare(symp, counts, max_sym, 16)


def test_model_evolution_single_symbol():
    """One repeated symbol: max-rate normalisation and the pos=0
    no-swap edge."""
    symp = np.zeros((2, 6000), np.int32)
    symp[1, :] = 95
    counts = np.array([6000, 6000], np.int32)
    _compare(symp, counts, 96, 16)


_u8p = ctypes.POINTER(ctypes.c_uint8)


def _reg_tiny():
    L = native.lib()
    if not hasattr(L, "_tiny_reg"):
        L.fqz5_tiny_replay.restype = ctypes.c_int64
        L.fqz5_tiny_replay.argtypes = [
            ctypes.c_int, _u16p, _u8p, ctypes.c_uint32,
            _u32p, _u32p, _u32p]
        L._tiny_reg = True
    return L


def tiny_replay_native(nsym, syms, upd=None):
    L = _reg_tiny()
    n = len(syms)
    s = np.ascontiguousarray(syms, np.uint16)
    u = np.ascontiguousarray(
        upd if upd is not None else np.zeros(n, np.uint8), np.uint8)
    cum = np.zeros(n, np.uint32)
    freq = np.zeros(n, np.uint32)
    tot = np.zeros(n, np.uint32)
    rc = L.fqz5_tiny_replay(
        nsym, s.ctypes.data_as(_u16p), u.ctypes.data_as(_u8p), n,
        cum.ctypes.data_as(_u32p), freq.ctypes.data_as(_u32p),
        tot.ctypes.data_as(_u32p))
    assert rc == n
    return cum, freq, tot


@pytest.mark.parametrize("nsym", [2, 4])
@pytest.mark.parametrize("T", [50, 2000])
def test_tiny_model_evolution(nsym, T):
    """tiny_evolve vs the native TinyModel replay — STEP 1, normalise
    at pre-bump tot >= 255 (native/rc.h TinyModel)."""
    rng = np.random.default_rng(nsym * 100 + T)
    C = 7
    counts = rng.integers(1, T + 1, C).astype(np.int32)
    counts[0] = T
    symp = rng.integers(0, nsym, (C, T)).astype(np.int32)
    cums, freqs, tots = map(np.asarray, fqz_model_jax.tiny_evolve(
        symp, counts, nsym=nsym))
    for c in range(C):
        n = int(counts[c])
        wc, wf, wt = tiny_replay_native(nsym, symp[c, :n])
        assert np.array_equal(cums[c, :n], wc)
        assert np.array_equal(freqs[c, :n], wf)
        assert np.array_equal(tots[c, :n], wt)


def test_tiny_model_skewed_normalisation():
    """Single hot symbol drives the 255 normalisation repeatedly."""
    symp = np.zeros((2, 3000), np.int32)
    symp[1, :] = 3
    counts = np.array([3000, 3000], np.int32)
    cums, freqs, tots = map(np.asarray, fqz_model_jax.tiny_evolve(
        symp, counts, nsym=4))
    for c in range(2):
        wc, wf, wt = tiny_replay_native(4, symp[c])
        assert np.array_equal(cums[c], wc)
        assert np.array_equal(freqs[c], wf)
        assert np.array_equal(tots[c], wt)


def test_triples_for_stream_roundtrip():
    """Group-by-context + evolve + un-sort against a per-context
    native replay driven in stream order."""
    rng = np.random.default_rng(11)
    n, ncx, max_sym = 20000, 37, 40
    ctx = rng.integers(0, ncx, n).astype(np.uint32) * 1000 + 5
    qm = rng.integers(0, max_sym, n).astype(np.uint8)
    got_c, got_f, got_t = fqz_model_jax.triples_for_stream(
        ctx, qm, max_sym, 16)
    for u in np.unique(ctx):
        m = ctx == u
        wc, wf, wt = replay_native(max_sym, 16, qm[m].astype(np.uint16))
        assert np.array_equal(got_c[m], wc)
        assert np.array_equal(got_f[m], wf)
        assert np.array_equal(got_t[m], wt)
