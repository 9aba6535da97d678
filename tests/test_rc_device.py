"""Batched device range-coder walk vs the native coder (bit-exact).

The RC walk (ops/rc_jax.py) is the serialization stage of the two-pass
device decomposition for the adaptive codecs
(docs/DEVICE_ADAPTIVE_CODECS.md)."""

import ctypes

import numpy as np
import pytest

from fqzcomp5_tpu.codecs import native
from fqzcomp5_tpu.ops import rc_jax

_u8p = ctypes.POINTER(ctypes.c_uint8)
_u32p = ctypes.POINTER(ctypes.c_uint32)


def _reg():
    L = native.lib()
    if not hasattr(L, "_rc_reg"):
        L.fqz5_rc_encode_raw.restype = ctypes.c_int64
        L.fqz5_rc_encode_raw.argtypes = [_u32p, _u32p, _u32p,
                                         ctypes.c_uint32, _u8p,
                                         ctypes.c_uint32]
        L.fqz5_rc_decode_raw.restype = ctypes.c_int64
        L.fqz5_rc_decode_raw.argtypes = [_u8p, ctypes.c_uint32, _u32p,
                                         _u32p, _u32p, ctypes.c_uint32,
                                         _u32p]
        L._rc_reg = True
    return L


def rc_native_encode(cum, freq, tot):
    L = _reg()
    n = len(cum)
    out = np.empty(n * 5 + 16, np.uint8)
    a = [np.ascontiguousarray(x, np.uint32) for x in (cum, freq, tot)]
    rc = L.fqz5_rc_encode_raw(
        a[0].ctypes.data_as(_u32p), a[1].ctypes.data_as(_u32p),
        a[2].ctypes.data_as(_u32p), n, out.ctypes.data_as(_u8p),
        len(out))
    assert rc > 0
    return out[:rc].tobytes()


def _triples(rng, B, T, tot_lo=2, tot_hi=60000):
    tot = rng.integers(tot_lo, tot_hi, (B, T)).astype(np.uint32)
    freq = (rng.random((B, T)) * tot * 0.9).astype(np.uint32) + 1
    freq = np.minimum(freq, tot)
    cum = (rng.random((B, T)) * (tot - freq)).astype(np.uint32)
    return cum, freq, tot


@pytest.mark.parametrize("seed,B,T,lo,hi", [
    (0, 5, 400, 2, 60000),
    (1, 3, 1000, 2, 8),          # tiny totals: huge quotients
    (2, 4, 600, 60000, 65535),   # near the 2^16 bound
    (3, 7, 37, 2, 65535),
])
def test_rc_walk_bit_exact(seed, B, T, lo, hi):
    rng = np.random.default_rng(seed)
    cum, freq, tot = _triples(rng, B, T, lo, hi)
    state, (fl, ca, ff, cy) = rc_jax.encode_scan(cum, freq, tot)
    tails = rc_jax.finish_events(state)
    fl, ca, ff, cy = map(np.asarray, (fl, ca, ff, cy))
    for b in range(B):
        got = rc_jax.assemble_stream(fl[b], ca[b], ff[b], cy[b],
                                     tails[b])
        want = rc_native_encode(cum[b], freq[b], tot[b])
        assert got == want, f"stream {b}"


def test_rc_walk_skewed_carry_runs():
    """Maximal-cum symbols push low toward the carry/FF-run paths."""
    rng = np.random.default_rng(9)
    B, T = 3, 800
    tot = np.full((B, T), 1 << 15, np.uint32)
    freq = np.ones((B, T), np.uint32)
    cum = np.full((B, T), (1 << 15) - 1, np.uint32)
    # sprinkle normal symbols so the state keeps moving
    m = rng.random((B, T)) < 0.3
    freq[m] = 1 << 14
    cum[m] = 0
    state, evs = rc_jax.encode_scan(cum, freq, tot)
    tails = rc_jax.finish_events(state)
    evs = [np.asarray(e) for e in evs]
    for b in range(B):
        got = rc_jax.assemble_stream(evs[0][b], evs[1][b], evs[2][b],
                                     evs[3][b], tails[b])
        want = rc_native_encode(cum[b], freq[b], tot[b])
        assert got == want


def test_rc_walk_ragged_active():
    """Ragged batches: inactive steps must not disturb the stream."""
    rng = np.random.default_rng(4)
    B, T = 4, 300
    cum, freq, tot = _triples(rng, B, T)
    treal = np.array([300, 17, 1, 299])
    active = np.arange(T)[None, :] < treal[:, None]
    state, evs = rc_jax.encode_scan(cum, freq, tot, active=active)
    tails = rc_jax.finish_events(state)
    evs = [np.asarray(e) for e in evs]
    for b in range(B):
        n = treal[b]
        got = rc_jax.assemble_stream(evs[0][b], evs[1][b], evs[2][b],
                                     evs[3][b], tails[b])
        want = rc_native_encode(cum[b][:n], freq[b][:n], tot[b][:n])
        assert got == want, f"stream {b} n={n}"


# ---- Pallas pass-3 kernel (ops/rc_pallas.py), interpret mode --------

def _pallas_parity(cum, freq, tot, active=None, chunks=None):
    from fqzcomp5_tpu.ops import rc_pallas

    B, T = cum.shape
    if chunks is None:
        state, (fl, ca, ff, cy) = rc_pallas.encode_walk(
            cum, freq, tot, active=active, interpret=True)
        parts = [[rc_jax.assemble_stream(fl[b], ca[b], ff[b], cy[b],
                                         b"")] for b in range(B)]
    else:
        state = None
        parts = [[] for _ in range(B)]
        for t0 in range(0, T, chunks):
            t1 = min(t0 + chunks, T)
            act = active[:, t0:t1] if active is not None else None
            state, (fl, ca, ff, cy) = rc_pallas.encode_walk(
                cum[:, t0:t1], freq[:, t0:t1], tot[:, t0:t1],
                active=act, state0=state, interpret=True)
            for b in range(B):
                parts[b].append(rc_jax.assemble_stream(
                    fl[b], ca[b], ff[b], cy[b], b""))
    tails = rc_jax.finish_events(state)
    return [b"".join(parts[b]) + tails[b] for b in range(B)]


@pytest.mark.parametrize("seed,B,T,lo,hi", [
    (0, 5, 400, 2, 60000),
    (1, 3, 700, 2, 8),
    (2, 4, 500, 60000, 65535),
    (3, 140, 37, 2, 65535),      # >128 streams: two lane rows
])
def test_rc_pallas_bit_exact(seed, B, T, lo, hi):
    rng = np.random.default_rng(seed)
    cum, freq, tot = _triples(rng, B, T, lo, hi)
    outs = _pallas_parity(cum, freq, tot)
    for b in range(B):
        want = rc_native_encode(cum[b], freq[b], tot[b])
        assert outs[b] == want, f"stream {b}"


def test_rc_pallas_skewed_carry_runs():
    rng = np.random.default_rng(9)
    B, T = 3, 800
    tot = np.full((B, T), 1 << 15, np.uint32)
    freq = np.ones((B, T), np.uint32)
    cum = np.full((B, T), (1 << 15) - 1, np.uint32)
    m = rng.random((B, T)) < 0.3
    freq[m] = 1 << 14
    cum[m] = 0
    outs = _pallas_parity(cum, freq, tot)
    for b in range(B):
        want = rc_native_encode(cum[b], freq[b], tot[b])
        assert outs[b] == want


def test_rc_pallas_ragged_chunked():
    """Ragged active masks + chunked state carry across device calls."""
    rng = np.random.default_rng(4)
    B, T = 4, 300
    cum, freq, tot = _triples(rng, B, T)
    treal = np.array([300, 17, 1, 299])
    active = np.arange(T)[None, :] < treal[:, None]
    outs = _pallas_parity(cum, freq, tot, active=active, chunks=128)
    for b in range(B):
        n = treal[b]
        want = rc_native_encode(cum[b][:n], freq[b][:n], tot[b][:n])
        assert outs[b] == want, f"stream {b} n={n}"


def _compact_parity(cum, freq, tot, active=None, chunks=None):
    """encode_walk_compact (device-side byte assembly) must equal the
    plane download + host assemble_stream path byte-for-byte."""
    from fqzcomp5_tpu.ops import rc_pallas

    B, T = cum.shape
    state = None
    parts = [[] for _ in range(B)]
    step = chunks or T
    for t0 in range(0, T, step):
        t1 = min(t0 + step, T)
        act = active[:, t0:t1] if active is not None else None
        state, by, totals = rc_pallas.encode_walk_compact(
            cum[:, t0:t1], freq[:, t0:t1], tot[:, t0:t1],
            active=act, state0=state, interpret=True)
        for b in range(B):
            parts[b].append(by[b, :totals[b]].tobytes())
    tails = rc_jax.finish_events(state)
    return [b"".join(parts[b]) + tails[b] for b in range(B)]


@pytest.mark.parametrize("seed,B,T,lo,hi", [
    (0, 5, 400, 2, 60000),
    (2, 4, 500, 60000, 65535),
    (3, 140, 37, 2, 65535),
])
def test_rc_pallas_compact_bit_exact(seed, B, T, lo, hi):
    rng = np.random.default_rng(seed)
    cum, freq, tot = _triples(rng, B, T, lo, hi)
    outs = _compact_parity(cum, freq, tot)
    for b in range(B):
        want = rc_native_encode(cum[b], freq[b], tot[b])
        assert outs[b] == want, f"stream {b}"


def test_rc_pallas_compact_carry_runs_chunked():
    """0xFF carry runs crossing chunk boundaries through the compact
    path (ff counts carried in STATE; runs land in a later chunk)."""
    rng = np.random.default_rng(9)
    B, T = 3, 800
    tot = np.full((B, T), 1 << 15, np.uint32)
    freq = np.ones((B, T), np.uint32)
    cum = np.full((B, T), (1 << 15) - 1, np.uint32)
    m = rng.random((B, T)) < 0.3
    freq[m] = 1 << 14
    cum[m] = 0
    outs = _compact_parity(cum, freq, tot, chunks=128)
    for b in range(B):
        want = rc_native_encode(cum[b], freq[b], tot[b])
        assert outs[b] == want


def test_rc_pallas_compact_ragged():
    rng = np.random.default_rng(4)
    B, T = 4, 300
    cum, freq, tot = _triples(rng, B, T)
    treal = np.array([300, 17, 1, 299])
    active = np.arange(T)[None, :] < treal[:, None]
    outs = _compact_parity(cum, freq, tot, active=active, chunks=128)
    for b in range(B):
        n = treal[b]
        want = rc_native_encode(cum[b][:n], freq[b][:n], tot[b][:n])
        assert outs[b] == want, f"stream {b} n={n}"


def test_rc_pallas_compact_idx_bit_exact():
    """encode_walk_compact_idx (index planes into device-resident
    triples) must reproduce the native coder bytes, including chunked
    state carry, ragged stream ends (sentinel indices), and the
    inactive sentinel's (0,1,2) triple."""
    import jax.numpy as jnp

    from fqzcomp5_tpu.ops import rc_pallas

    rng = np.random.default_rng(12)
    B, T = 5, 700
    cum, freq, tot = _triples(rng, B, T)
    treal = np.array([700, 123, 1, 699, 400])

    # device-resident vectors with a host-side shuffle (as DevTriples
    # produces: values live at arbitrary flat positions)
    n = B * T
    perm = rng.permutation(n)
    Vc = np.zeros(n + 1, np.int32)
    Vf = np.ones(n + 1, np.int32)
    Vt = np.full(n + 1, 2, np.int32)
    Vc[perm] = cum.reshape(-1)
    Vf[perm] = freq.reshape(-1)
    Vt[perm] = tot.reshape(-1)
    flat = perm.reshape(B, T)
    V = tuple(jnp.asarray(x) for x in (Vc, Vf, Vt))

    state = None
    parts = [[] for _ in range(B)]
    for t0 in range(0, T, 256):
        t1 = min(t0 + 256, T)
        idx = np.full((B, t1 - t0), n, np.int32)
        for b in range(B):
            k = max(0, min(treal[b], t1) - t0)
            idx[b, :k] = flat[b, t0:t0 + k]
        state, by, totals = rc_pallas.encode_walk_compact_idx(
            V, idx, state0=state, interpret=True)
        for b in range(B):
            parts[b].append(by[b, :totals[b]].tobytes())
    tails = rc_jax.finish_events(state)
    for b in range(B):
        nr = treal[b]
        want = rc_native_encode(cum[b][:nr], freq[b][:nr], tot[b][:nr])
        got = b"".join(parts[b]) + tails[b]
        assert got == want, f"stream {b} n={nr}"
