"""Pallas decode-walk parity (interpreter mode; tests run on CPU).

Streams come from the real engine encoder, so this exercises the full
wire format: 32 flush states + interleaved renormalisation words."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # jax/device-heavy: nightly tier (fast tier: pytest -m 'not slow')

from fqzcomp5_tpu import engine_tpu
from fqzcomp5_tpu.ops import rans_pallas_dec


def _prep(datas):
    import ctypes

    L = engine_tpu._lib()
    payloads = engine_tpu.encode_o0_batch(datas)
    B = len(datas)
    s3s = np.empty((B, 1 << 12), np.uint32)
    bodies = []
    for b, p in enumerate(payloads):
        arr = np.frombuffer(p, np.uint8)
        used = L.fqz5_rans_o0_dec_prep(
            engine_tpu._ptr(arr), len(arr),
            s3s[b].ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
        assert used > 0
        bodies.append(arr[used:])
    freqs = np.stack([engine_tpu.o0_prep(d)[1] for d in datas])
    Wmax = max(max((len(x) - 128 + 1) // 2 for x in bodies) // 128 + 3, 3)
    words = np.zeros((B, Wmax, 128), np.int32)
    R0 = np.zeros((B, 128), np.int32)
    for b, body in enumerate(bodies):
        R0[b, :32] = body[:128].copy().view("<u4").astype(np.int32)
        wb = body[128:]
        if len(wb) & 1:
            wb = np.concatenate([wb, np.zeros(1, np.uint8)])
        w16 = wb.copy().view("<u2").astype(np.int32)
        flat = np.zeros(Wmax * 128, np.int32)
        flat[:len(w16)] = w16
        words[b] = flat.reshape(Wmax, 128)
    return words, freqs, R0


@pytest.mark.parametrize("S", [64, 256])
def test_decode_walk_parity(S):
    rng = np.random.default_rng(3)
    B = 6
    # the S bucket bounds the max SYMBOL VALUE: quality-style bytes for
    # S=64, raw ACGTN bytes for S=256
    alpha = (np.arange(5, dtype=np.uint8) + 2 if S == 64
             else np.frombuffer(b"ACGTN", np.uint8))
    datas = []
    for b in range(B):
        n = int(rng.integers(300, 5000))
        datas.append(rng.choice(
            alpha, n, p=[.3, .2, .2, .25, .05]).tobytes())
    words, freqs, R0 = _prep(datas)
    treal = np.array([len(d) // 32 for d in datas], np.int32)
    T = int(treal.max())
    tab = rans_pallas_dec.build_dec_tables(freqs, 12, S)
    f0 = freqs[:, :1].astype(np.int32)
    syms, Rf = rans_pallas_dec.decode_walk(
        words, tab, f0, R0, treal, T=T, shift=12, S=S, interpret=True)
    syms = np.asarray(syms)
    for b, d in enumerate(datas):
        t = len(d) // 32
        got = syms[:t, b, :32].reshape(-1).astype(np.uint8)
        assert np.array_equal(got, np.frombuffer(d, np.uint8)[:t * 32]), b
    # word cursor (lane 32) counts every consumed word
    Rf = np.asarray(Rf)
    assert (Rf[:, 32] >= 0).all()


def test_decode_o0_batch_pallas_path(monkeypatch):
    """decode_o0_batch via the interpret-mode Pallas path must match
    the scan path bit-for-bit, including the <32-byte tails."""
    from fqzcomp5_tpu.ops import rans_pallas_dec as rpd

    rng = np.random.default_rng(9)
    datas = [rng.choice(np.frombuffer(b"ACGTN", np.uint8),
                        int(rng.integers(40, 4000))).tobytes()
             for _ in range(5)]
    payloads = engine_tpu.encode_o0_batch(datas)
    szs = [len(d) for d in datas]
    want = engine_tpu.decode_o0_batch(payloads, szs)
    assert want == datas

    orig = rpd.decode_walk4v3

    def walk_interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(rpd, "decode_walk4v3", walk_interp)
    monkeypatch.setenv("FQZ5_PALLAS", "1")
    monkeypatch.setenv("FQZ5_DEC_V3", "1")  # v5 is the default now
    got = engine_tpu.decode_o0_batch(payloads, szs)
    assert got == datas


def test_decode_o1_batch_pallas_path(monkeypatch):
    """Order-1 Pallas decode (dense-alphabet) must match the scan path
    across ragged sizes, tails, and both DNA- and quality-like
    alphabets."""
    from fqzcomp5_tpu.ops import rans_pallas_dec as rpd

    orig = rpd.decode_walk4v3_o1

    def walk_interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(rpd, "decode_walk4v3_o1", walk_interp)
    monkeypatch.setenv("FQZ5_DEC_V3", "1")  # v5 is the default now

    rng = np.random.default_rng(7)
    motif = rng.choice(list(b"ACGT"), 48).astype(np.uint8)
    datas = []
    for i in range(5):
        n = int(rng.integers(600, 2501))
        reps = np.tile(motif, n // 48 + 1)[:n].copy()
        fl = rng.integers(0, n, n // 9)
        reps[fl] = rng.choice(list(b"ACGT"), len(fl))
        datas.append(reps.tobytes())
    # a wider alphabet (A~12, still cheap in interpreter mode)
    q = (np.clip(np.cumsum(rng.integers(-2, 3, 1500)), 0, 11)
         .astype(np.uint8) + 2).tobytes()
    datas.append(q)

    payloads = engine_tpu.encode_o1_batch(datas)
    szs = [len(d) for d in datas]
    want = engine_tpu.decode_o1_batch(payloads, szs)
    assert want == datas

    monkeypatch.setenv("FQZ5_PALLAS", "1")
    got = engine_tpu.decode_o1_batch(payloads, szs)
    assert got == datas


def test_decode_walk4v4_parity():
    """The v4 experiment kernel (rows=1, dynamic-roll alignment) must
    reproduce the same symbols as the scan decode / original data."""
    from fqzcomp5_tpu.ops import rans_pallas_dec as rpd

    rng = np.random.default_rng(11)
    B, S = 8, 64
    alpha = np.arange(46, dtype=np.uint8) + 2
    datas = []
    for b in range(B):
        n = int(rng.integers(1000, 6000)) // 32 * 32
        datas.append(rng.choice(alpha, n).tobytes())
    words, freqs, R0 = _prep(datas)
    treal = np.array([len(d) // 32 for d in datas], np.int32)
    T = int(treal.max())
    tab = rpd.build_dec_tables_p(freqs, 12, S)
    cexp = np.ascontiguousarray(rpd.expand4(tab).transpose(1, 0, 2))
    f0exp = rpd.expand4(freqs[:, :1].astype(np.int32))[:, 0, :]
    texp = rpd.expand4(treal.reshape(-1, 1))[:, 0, :].astype(np.int32)
    R0p = R0[:, :32].reshape(B // 4, 128).astype(np.int32)
    syms, Rf = rpd.decode_walk4v4(
        words, cexp, f0exp, R0p, texp, T=T, shift=12, S=S,
        interpret=True)
    syms = np.asarray(syms)
    for b, d in enumerate(datas):
        t = len(d) // 32
        sl = slice((b % 4) * 32, (b % 4) * 32 + 32)
        got = syms[:t, b // 4, sl].reshape(-1).astype(np.uint8)
        assert np.array_equal(got,
                              np.frombuffer(d, np.uint8)[:t * 32]), b


def test_decode_walk4v3_many_rows():
    """rows>8 per grid cell (the round-2 default is 64): correctness
    of the row-blocked grid partition, interpret mode at rows=16."""
    from fqzcomp5_tpu.ops import rans_pallas_dec as rpd

    rng = np.random.default_rng(23)
    B, S = 64, 64
    alpha = np.arange(46, dtype=np.uint8) + 2
    datas = [rng.choice(alpha, 1600).tobytes() for _ in range(B)]
    words, freqs, R0 = _prep(datas)
    treal = np.array([len(d) // 32 for d in datas], np.int32)
    T = int(treal.max())
    tab = rpd.build_dec_tables_p(freqs, 12, S)
    cexp = np.ascontiguousarray(rpd.expand4(tab).transpose(1, 0, 2))
    f0exp = rpd.expand4(freqs[:, :1].astype(np.int32))[:, 0, :]
    texp = rpd.expand4(treal.reshape(-1, 1))[:, 0, :].astype(np.int32)
    R0p = R0[:, :32].reshape(B // 4, 128).astype(np.int32)
    syms, Rf = rpd.decode_walk4v3(words, cexp, f0exp, R0p, texp, T=T,
                                  shift=12, S=S, interpret=True,
                                  rows_cap=16)
    syms = np.asarray(syms)
    for b, d in enumerate(datas):
        t = len(d) // 32
        sl = slice((b % 4) * 32, (b % 4) * 32 + 32)
        got = syms[:t, b // 4, sl].reshape(-1).astype(np.uint8)
        assert np.array_equal(got,
                              np.frombuffer(d, np.uint8)[:t * 32]), b


def test_decode_walk4v3_rows64_mask_split():
    """rows=64 exercises the split lo/hi crossing bitmasks (TPU int32
    shifts alias mod 32 — a single 1<<row mask corrupted rows>=32 and
    aliased onto rows<32; found by a hardware roundtrip)."""
    from fqzcomp5_tpu.ops import rans_pallas_dec as rpd

    rng = np.random.default_rng(29)
    B, S = 256, 16
    alpha = np.arange(5, dtype=np.uint8) + 2
    datas = [rng.choice(alpha, 800).tobytes() for _ in range(B)]
    words, freqs, R0 = _prep(datas)
    treal = np.array([len(d) // 32 for d in datas], np.int32)
    T = int(treal.max())
    tab = rpd.build_dec_tables_p(freqs, 12, S)
    cexp = np.ascontiguousarray(rpd.expand4(tab).transpose(1, 0, 2))
    f0exp = rpd.expand4(freqs[:, :1].astype(np.int32))[:, 0, :]
    texp = rpd.expand4(treal.reshape(-1, 1))[:, 0, :].astype(np.int32)
    R0p = R0[:, :32].reshape(B // 4, 128).astype(np.int32)
    syms, Rf = rpd.decode_walk4v3(words, cexp, f0exp, R0p, texp, T=T,
                                  shift=12, S=S, interpret=True,
                                  rows_cap=64)
    syms = np.asarray(syms)
    for b in (0, 5, 31 * 4, 32 * 4, 40 * 4 + 1, 63 * 4 + 3):
        d = datas[b]
        t = len(d) // 32
        sl = slice((b % 4) * 32, (b % 4) * 32 + 32)
        got = syms[:t, b // 4, sl].reshape(-1).astype(np.uint8)
        assert np.array_equal(got,
                              np.frombuffer(d, np.uint8)[:t * 32]), b


@pytest.mark.parametrize("S,rows_cap", [(64, 8), (16, 16), (256, 8)])
def test_decode_walk4v5_parity(S, rows_cap):
    """v5 (compact-chunk incremental word feed) must reproduce the
    stream symbols across alphabet buckets and row blockings, with
    streams long enough to force several DMA window rotations."""
    from fqzcomp5_tpu.ops import rans_pallas_dec as rpd

    rng = np.random.default_rng(13 + S)
    B = 4 * max(rows_cap, 8)
    if S == 16:
        alpha = np.arange(5, dtype=np.uint8) + 2
    elif S == 64:
        alpha = np.arange(46, dtype=np.uint8) + 2
    else:
        alpha = np.frombuffer(b"ACGTN", np.uint8)
    datas = [rng.choice(alpha, int(rng.integers(800, 9000))).tobytes()
             for _ in range(B)]
    words, freqs, R0 = _prep(datas)
    treal = np.array([len(d) // 32 for d in datas], np.int32)
    T = int(treal.max())
    if S <= 64:
        tab = rpd.build_dec_tables_p(freqs, 12, S)
    else:
        tab = rpd.build_dec_tables(freqs, 12, S)
    cexp = np.ascontiguousarray(rpd.expand4(tab).transpose(1, 0, 2))
    f0exp = rpd.expand4(freqs[:, :1].astype(np.int32))[:, 0, :]
    texp = rpd.expand4(treal.reshape(-1, 1))[:, 0, :].astype(np.int32)
    R0p = R0[:, :32].reshape(B // 4, 128).astype(np.int32)
    syms, Rf = rpd.decode_walk4v5(words, cexp, f0exp, R0p, texp, T=T,
                                  shift=12, S=S, interpret=True,
                                  rows_cap=rows_cap)
    syms = np.asarray(syms)
    for b, d in enumerate(datas):
        t = len(d) // 32
        sl = slice((b % 4) * 32, (b % 4) * 32 + 32)
        got = syms[:t, b // 4, sl].reshape(-1).astype(np.uint8)
        assert np.array_equal(got,
                              np.frombuffer(d, np.uint8)[:t * 32]), b


def test_decode_o0_v5_engine_path(monkeypatch):
    """decode_o0_batch through the v5 kernel (FQZ5_DEC_V5, interpret
    mode) must match the scan path bit-for-bit incl. tails."""
    from fqzcomp5_tpu.ops import rans_pallas_dec as rpd

    orig = rpd.decode_walk4v5

    def walk_interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(rpd, "decode_walk4v5", walk_interp)
    rng = np.random.default_rng(15)
    datas = [rng.choice(np.frombuffer(b"ACGTN", np.uint8),
                        int(rng.integers(40, 4000))).tobytes()
             for _ in range(5)]
    payloads = engine_tpu.encode_o0_batch(datas)
    szs = [len(d) for d in datas]
    want = engine_tpu.decode_o0_batch(payloads, szs)
    assert want == datas

    monkeypatch.setenv("FQZ5_PALLAS", "1")
    monkeypatch.setenv("FQZ5_DEC_V5", "1")
    got = engine_tpu.decode_o0_batch(payloads, szs)
    assert got == datas


def test_decode_o1_v5_engine_path(monkeypatch):
    """Order-1 decode through the v5 compact-chunk kernel (engine
    path, interpret mode) must match the scan decode bit-for-bit."""
    from fqzcomp5_tpu.ops import rans_pallas_dec as rpd

    orig = rpd.decode_walk4v5_o1

    def walk_interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(rpd, "decode_walk4v5_o1", walk_interp)

    rng = np.random.default_rng(19)
    motif = rng.choice(list(b"ACGT"), 48).astype(np.uint8)
    datas = []
    for i in range(5):
        n = int(rng.integers(600, 2501))
        reps = np.tile(motif, n // 48 + 1)[:n].copy()
        fl = rng.integers(0, n, n // 9)
        reps[fl] = rng.choice(list(b"ACGT"), len(fl))
        datas.append(reps.tobytes())
    q = (np.clip(np.cumsum(rng.integers(-2, 3, 1500)), 0, 11)
         .astype(np.uint8) + 2).tobytes()
    datas.append(q)

    payloads = engine_tpu.encode_o1_batch(datas)
    szs = [len(d) for d in datas]
    want = engine_tpu.decode_o1_batch(payloads, szs)
    assert want == datas

    monkeypatch.setenv("FQZ5_PALLAS", "1")
    monkeypatch.setenv("FQZ5_DEC_V5", "1")
    got = engine_tpu.decode_o1_batch(payloads, szs)
    assert got == datas


def test_decode_walk4v5_ragged_tiny():
    """v5 with ragged stream lengths incl. tiny (<32 byte) streams and
    pad rows (degenerate tables, treal=0)."""
    from fqzcomp5_tpu.ops import rans_pallas_dec as rpd

    rng = np.random.default_rng(17)
    alpha = np.arange(5, dtype=np.uint8) + 2
    lens = [33, 4000, 200, 65, 1024, 7777, 96, 130]
    datas = [rng.choice(alpha, n).tobytes() for n in lens]
    words, freqs, R0 = _prep(datas)
    treal = np.array([len(d) // 32 for d in datas], np.int32)
    T = int(treal.max())
    tab = rpd.build_dec_tables_p(freqs, 12, 16)
    cexp = np.ascontiguousarray(rpd.expand4(tab).transpose(1, 0, 2))
    f0exp = rpd.expand4(freqs[:, :1].astype(np.int32))[:, 0, :]
    texp = rpd.expand4(treal.reshape(-1, 1))[:, 0, :].astype(np.int32)
    R0p = R0[:, :32].reshape(len(datas) // 4, 128).astype(np.int32)
    syms, Rf = rpd.decode_walk4v5(words, cexp, f0exp, R0p, texp, T=T,
                                  shift=12, S=16, interpret=True)
    syms = np.asarray(syms)
    for b, d in enumerate(datas):
        t = len(d) // 32
        sl = slice((b % 4) * 32, (b % 4) * 32 + 32)
        got = syms[:t, b // 4, sl].reshape(-1).astype(np.uint8)
        assert np.array_equal(got,
                              np.frombuffer(d, np.uint8)[:t * 32]), b


def test_decode_o0_s32_bucket(monkeypatch):
    """Alphabets 17-31 take the S=32 bucket (round-2 addition)."""
    from fqzcomp5_tpu.ops import rans_pallas_dec as rpd

    orig = rpd.decode_walk4v3

    def walk_interp(*a, **k):
        k["interpret"] = True
        assert k.get("S", a and None) or True
        return orig(*a, **k)

    monkeypatch.setattr(rpd, "decode_walk4v3", walk_interp)
    monkeypatch.setenv("FQZ5_DEC_V3", "1")  # v5 is the default now
    rng = np.random.default_rng(41)
    alpha = np.arange(24, dtype=np.uint8) + 3   # 24 symbols -> S=32
    datas = [rng.choice(alpha, int(rng.integers(200, 2000))).tobytes()
             for _ in range(5)]
    payloads = engine_tpu.encode_o0_batch(datas)  # scan-path encode
    monkeypatch.setenv("FQZ5_PALLAS", "1")
    got = engine_tpu.decode_o0_batch(payloads, [len(d) for d in datas])
    assert got == datas
