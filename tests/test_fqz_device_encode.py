"""End-to-end device fqz-qual encode (passes 1+2+3 composed,
ops/fqz_device_encode.py): the device range-coder payload must
byte-match the native fqz_compress output after the parameter header
(native/fqzqual.cpp:663-762)."""

import ctypes

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # jax/device-heavy: nightly tier (fast tier: pytest -m 'not slow')

from fqzcomp5_tpu.codecs import host, native
from fqzcomp5_tpu.ops import fqz_ctx_jax, fqz_device_encode

_u8p = ctypes.POINTER(ctypes.c_uint8)
_u32p = ctypes.POINTER(ctypes.c_uint32)


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


def _params(q, lens, flags, strat, seq=None):
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
    if seq is None:
        seqp = None
    else:
        sa = np.frombuffer(seq, np.uint8)
        seqp = sa.ctypes.data_as(_u8p)
    rc = L.fqz5_fqz_dump_ctx(
        qa.ctypes.data_as(_u8p), total, la.ctypes.data_as(_u32p),
        fl.ctypes.data_as(_u32p), nrec, strat,
        ctx.ctypes.data_as(_u32p), qm.ctypes.data_as(_u8p),
        par.ctypes.data_as(_u32p), len(par),
        sels.ctypes.data_as(_u32p), seqp)
    assert rc > 0
    return fqz_ctx_jax.FqzParams.parse(par[:rc]), sels


def _case(kind, nrec=300):
    rng = np.random.default_rng(hash(kind) % 2**31)
    if kind in ("fixed", "dups"):
        lens = np.full(nrec, 100, np.uint32)
    else:
        lens = rng.integers(40, 180, nrec).astype(np.uint32)
    total = int(lens.sum())
    if kind == "binned":
        q = rng.choice(np.array([2, 12, 22, 37], np.uint8), total)
    else:
        q = np.clip(np.cumsum(rng.integers(-2, 3, total)) % 40 + 3,
                    0, 45).astype(np.uint8)
    if kind == "dups":
        # byte-identical neighbours to arm any dedup path
        for r in range(2, nrec, 7):
            q[r * 100:(r + 1) * 100] = q[(r - 1) * 100:r * 100]
    flags = np.zeros(nrec, np.uint32)
    if kind == "r2":
        flags[1::2] = 128
    return bytes(q), lens, flags


@pytest.mark.parametrize("strat", [0, 1, 2, 3])
@pytest.mark.parametrize("kind", ["var", "fixed", "binned", "r2",
                                  "dups"])
def test_fqz_device_encode_payload_parity(strat, kind):
    q, lens, flags = _case(kind)
    P, sels = _params(q, lens, flags, strat)
    got = fqz_device_encode.encode_payload(q, lens, sels, P)
    want = host.fqz_compress(q, lens, flags, None, strat)
    # got is everything after put_uv(in_size) + store_parameters
    assert len(got) > len(want) // 2, (len(got), len(want))
    assert want.endswith(got), f"{kind} strat {strat}"


@pytest.mark.parametrize("strat", [3, 4])
def test_fqz_device_encode_seq_conditioned(strat):
    """kGUseSeq: strategies 3/4 condition the quality context on the
    read bases (bbits/bloc/boff; fqzqual.cpp:502-504, update_ctx
    lines 214-215)."""
    q, lens, flags = _case("fixed")
    rng = np.random.default_rng(21)
    seq = bytes(rng.choice(np.frombuffer(b"ACGTN", np.uint8),
                           len(q), p=[0.3, 0.2, 0.2, 0.28, 0.02]))
    P, sels = _params(q, lens, flags, strat, seq=seq)
    assert P.bbits.any(), "strategy should enable seq conditioning"
    got = fqz_device_encode.encode_payload(q, lens, sels, P, seq=seq)
    want = host.fqz_compress(q, lens, flags, seq, strat)
    assert want.endswith(got), f"strat {strat}"
    spliced = want[:len(want) - len(got)] + got
    assert host.fqz_decompress(spliced, len(q), seq_buf=seq) == q


def test_fqz_device_encode_edge_shapes():
    """Long records (> the 1024-entry ptab, clamped at st.p=1023 —
    fqzqual.cpp:212), single-record blocks and length-1 records."""
    rng = np.random.default_rng(17)
    cases = []
    # 2000-byte records: position clamp fires for most of each read
    lens = np.full(20, 2000, np.uint32)
    q = np.clip(np.cumsum(rng.integers(-2, 3, int(lens.sum())))
                % 40 + 3, 0, 45).astype(np.uint8)
    cases.append((bytes(q), lens))
    # one record only
    cases.append((bytes(q[:500]), np.array([500], np.uint32)))
    # length-1 records
    lens1 = np.ones(64, np.uint32)
    cases.append((bytes(q[:64]), lens1))
    for qual, ln in cases:
        flags = np.zeros(len(ln), np.uint32)
        for strat in (0, 1):
            P, sels = _params(qual, ln, flags, strat)
            got = fqz_device_encode.encode_payload(qual, ln, sels, P)
            want = host.fqz_compress(qual, ln, flags, None, strat)
            assert want.endswith(got), (len(ln), int(ln[0]), strat)


@pytest.mark.parametrize("strat", [3, 4])
def test_fqz_device_encode_short_records_seq(strat):
    """Records shorter than boff: native seeds st.seq from seq[off+b]
    for ALL b < boff, reading into the next record's bases
    (fqzqual.cpp:727) — the device path must mirror that, not mask at
    the record length (round-1 advisor finding: the masked variant
    emitted byte-divergent payloads that fail native decode)."""
    rng = np.random.default_rng(51)
    # mix of len-1/len-2 records among normal ones so boff (2 at
    # strat 3) exceeds some records' lengths
    lens = rng.integers(40, 120, 200).astype(np.uint32)
    lens[5::17] = 1
    lens[11::23] = 2
    total = int(lens.sum())
    q = np.clip(np.cumsum(rng.integers(-2, 3, total)) % 40 + 3,
                0, 45).astype(np.uint8)
    qb = bytes(q)
    seq = bytes(rng.choice(np.frombuffer(b"ACGTN", np.uint8), total,
                           p=[0.3, 0.2, 0.2, 0.28, 0.02]))
    flags = np.zeros(len(lens), np.uint32)
    P, sels = _params(qb, lens, flags, strat, seq=seq)
    if not P.bbits.any():
        pytest.skip("strategy did not enable seq conditioning")
    got = fqz_device_encode.encode_payload(qb, lens, sels, P, seq=seq)
    want = host.fqz_compress(qb, lens, flags, seq, strat)
    assert want.endswith(got), f"strat {strat}"
    spliced = want[:len(want) - len(got)] + got
    assert host.fqz_decompress(spliced, len(qb), seq_buf=seq) == qb


def test_fqz_compress_device_drop_in():
    """fqz_compress_device (fqz5_fqz_prepare header + device payload)
    equals host.fqz_compress byte-for-byte, with and without seq."""
    q, lens, flags = _case("var")
    rng = np.random.default_rng(31)
    seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), len(q)))
    for strat, sb in [(0, None), (1, None), (3, seq), (4, seq)]:
        got = fqz_device_encode.fqz_compress_device(
            q, lens, flags, sb, strat)
        want = host.fqz_compress(q, lens, flags, sb, strat)
        assert got == want, f"strat {strat} seq={sb is not None}"


def test_cli_device_adaptive_matches_golden(tmp_path, monkeypatch):
    """FQZ5_DEVICE_ADAPTIVE=1 routes -5's SEQ/FQZ sections through the
    device decomposition; the archive must stay byte-identical to the
    reference golden file."""
    import pathlib

    from fqzcomp5_tpu import cli

    data_dir = pathlib.Path(__file__).parent / "data"
    golden = data_dir / "golden" / "sample.L5.fqz5"
    if not golden.exists():
        pytest.skip("golden files not present")
    monkeypatch.setenv("FQZ5_DEVICE_ADAPTIVE", "1")
    comp = tmp_path / "c.fqz5"
    assert cli.main(["-5", "-t", "2", str(data_dir / "sample.fastq"),
                     str(comp)]) == 0
    assert comp.read_bytes() == golden.read_bytes()


def test_fqz_device_encode_decodes_back():
    """The composed payload is the real stream: native decode of the
    spliced (header + device payload) must reproduce the input."""
    q, lens, flags = _case("var")
    P, sels = _params(q, lens, flags, 1)
    got = fqz_device_encode.encode_payload(q, lens, sels, P)
    want = host.fqz_compress(q, lens, flags, None, 1)
    spliced = want[:len(want) - len(got)] + got
    back = host.fqz_decompress(spliced, len(q))
    assert back == q
