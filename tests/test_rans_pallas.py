"""Pallas encode-walk parity vs the lax.scan formulation.

Runs the kernel in interpreter mode (tests force the CPU backend); the
same kernel compiles for real TPUs via Mosaic, where engine parity is
additionally guaranteed by backend.encode_flat producing identical
bytes on both paths (checked on hardware during development).
"""

import numpy as np
import pytest

from fqzcomp5_tpu.ops import rans_jax, rans_pallas

RNG = np.random.default_rng(42)


def rand_freqs(B, shift, ns_max=60, seed=0):
    rng = np.random.default_rng(seed)
    tot = 1 << shift
    freqs = np.zeros((B, 256), np.uint32)
    for b in range(B):
        ns = rng.integers(2, ns_max)
        f = rng.integers(1, 100, ns).astype(np.float64)
        f = np.floor(f / f.sum() * tot).astype(np.int64)
        f[f == 0] = 1
        f[np.argmax(f)] += tot - f.sum()
        freqs[b, :ns] = f
    return freqs


def scan_reference(flat, freqs, shift, R0=None):
    B = flat.shape[0]
    tt = rans_jax.build_enc_tables(freqs, shift)
    app = lambda a, v: np.concatenate(  # noqa: E731
        [a.reshape(B, -1), np.full((B, 1), v, a.dtype)], axis=1)
    return rans_jax.encode_scan_flat(
        flat, app(tt[0], 0xFFFFFFFF), app(tt[1], 0), app(tt[2], 0),
        app(tt[3], 0), app(tt[4], 0), R0)


@pytest.mark.parametrize("shift", [10, 12])
@pytest.mark.parametrize("B,T", [(4, 32), (6, 50), (1, 7), (9, 96)])
def test_pallas_encode_parity(shift, B, T):
    freqs = rand_freqs(B, shift, seed=B * 100 + T + shift)
    rng = np.random.default_rng(B + T)
    flat = np.stack([rng.choice(np.flatnonzero(freqs[b]), (T, 32))
                     for b in range(B)]).astype(np.int32)
    flat[0, -2:] = 256  # no-op sentinel steps (ragged-batch padding)
    Rf1, w1, m1 = map(np.asarray, scan_reference(flat, freqs, shift))
    pt = rans_pallas.build_packed_tables(freqs, shift)
    Rf2, w2, m2 = map(np.asarray, rans_pallas.encode_scan_flat_pallas(
        flat, pt, shift=shift, interpret=True))
    assert np.array_equal(Rf1, Rf2)
    assert np.array_equal(m1, m2)
    assert np.array_equal(w1[m1], w2[m2])


def test_pallas_encode_parity_with_r0():
    shift = 12
    B, T = 5, 40
    freqs = rand_freqs(B, shift, seed=7)
    rng = np.random.default_rng(17)
    flat = np.stack([rng.choice(np.flatnonzero(freqs[b]), (T, 32))
                     for b in range(B)]).astype(np.int32)
    R0 = rng.integers(rans_pallas.RANS_L, 1 << 30, (B, 32)).astype(np.uint32)
    Rf1, w1, m1 = map(np.asarray, scan_reference(flat, freqs, shift, R0))
    pt = rans_pallas.build_packed_tables(freqs, shift)
    Rf2, w2, m2 = map(np.asarray, rans_pallas.encode_scan_flat_pallas(
        flat, pt, R0=R0, shift=shift, interpret=True))
    assert np.array_equal(Rf1, Rf2)
    assert np.array_equal(m1, m2)
    assert np.array_equal(w1[m1], w2[m2])


def test_packed_tables_o1_context_starts():
    # order-1: starts are per-context cumsums, not global
    shift = 10
    freqs = np.zeros((1, 256, 256), np.uint32)
    freqs[0, 0, :4] = 256
    freqs[0, 3, 1] = 1024
    pt = rans_pallas.build_packed_tables(freqs, shift)
    assert pt.shape == (1, 256 * 256 + 1)
    # context 3, symbol 1: f=1024, start=0 within its own context
    assert pt[0, 3 * 256 + 1] == (1024 << shift) | 0
    # context 0, symbol 2: start = 512
    assert pt[0, 2] == (256 << shift) | 512
    # sentinel
    assert pt[0, -1] == 1 << (2 * shift)


def test_backend_env_switch(monkeypatch):
    from fqzcomp5_tpu.ops import backend

    monkeypatch.setenv("FQZ5_PALLAS", "0")
    assert not backend._use_pallas()
    monkeypatch.setenv("FQZ5_PALLAS", "1")
    assert backend._use_pallas()
