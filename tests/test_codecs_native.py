"""Byte-parity tests for LZP / arith / tok3 / fqz / seq vs the reference."""
import numpy as np
import pytest

from fqzcomp5_tpu.codecs import host
from tests import oracle_util as oracle

pytestmark = pytest.mark.skipif(
    not oracle.have_oracle(), reason="reference oracle not built")

RNG = np.random.default_rng(7)


def make_names(n=500, style="illumina"):
    out = []
    for i in range(n):
        if style == "illumina":
            out.append(
                f"SIM01:42:HHVVV:1:{1101 + i % 7}:{10000 + i * 13}:{90000 - i * 7}"
                .encode())
        elif style == "suffix":
            out.append(f"read_{i}/1".encode())
        elif style == "srr":
            out.append(f"SRR1238539.{i} {i}_1 length=205".encode())
        else:
            out.append(f"name{i}x{RNG.integers(0, 100)}".encode())
    return b"\x00".join(out) + b"\x00"


def dna(n):
    return RNG.choice(np.frombuffer(b"ACGT", np.uint8), n,
                      p=[.3, .2, .2, .3]).tobytes()


def quals(n, nsym=40):
    return np.clip(RNG.normal(30, 5, n), 0, nsym - 1).astype(np.uint8).tobytes()


# ---------------- LZP ----------------

def test_lzp_parity():
    for data in [b"", b"abcabcabcabc" * 20, make_names(200), dna(5000),
                 bytes([233, 234, 233]) * 10]:
        ours = host.lzp(data)
        ref = oracle.lzp_enc(data)
        assert ours == ref
        assert host.unlzp(ref, len(data)) == data
        assert oracle.lzp_dec(len(data), ours) == data


# ---------------- arith ----------------

@pytest.mark.parametrize("order", [0, 1, 64, 65, 128, 129, 192, 193,
                                   (4 << 8) | 8 | 1,
                                   4, 132])  # X_EXT / X_EXT|PACK (bzip2)
def test_arith_parity(order):
    for name, data in [("names", make_names(300)), ("dna", dna(3000)),
                       ("qual", quals(5000)), ("tiny", b"ab"),
                       ("runs", b"AAAABBBBCCCC" * 100)]:
        ours = host.arith_compress(data, order)
        ref = oracle.arith_enc(data, order)
        assert ours == ref, f"arith {name} order={order}"
        assert host.arith_uncompress(ref) == data
        assert oracle.arith_dec(ours) == data


def test_arith_ext_decodes_foreign_bz2_stream():
    """X_EXT streams from any upstream htscodecs producer must decode;
    we craft one with Python's bz2 (same libbz2, level 9)."""
    import bz2

    data = make_names(500)
    payload = bz2.compress(data, 9)
    ulen = len(data)
    varint = bytearray([ulen & 0x7F])
    v = ulen >> 7
    while v:
        varint.insert(0, (v & 0x7F) | 0x80)
        v >>= 7
    stream = bytes([0x04]) + bytes(varint) + payload
    assert host.arith_uncompress(stream) == data


def test_arith_ext_without_libbz2_fails_like_reference():
    """FQZ5_NO_BZ2=1 reproduces a libbz2-less build: X_EXT encode
    returns failure (reference arith_dynamic.c:967-970 NULL) and X_EXT
    decode errors (:1230) rather than mis-decoding.  Library init is
    one-time, so probe in a subprocess."""
    import os
    import subprocess
    import sys

    code = (
        "from fqzcomp5_tpu.codecs import host\n"
        "ok_enc = ok_dec = False\n"
        "try:\n"
        "    host.arith_compress(b'0123456789' * 100, 0x04)\n"
        "except ValueError:\n"
        "    ok_enc = True\n"
        "try:\n"
        "    host.arith_uncompress(bytes([0x04, 10]) + b'garbage')\n"
        "except ValueError:\n"
        "    ok_dec = True\n"
        "assert ok_enc and ok_dec, (ok_enc, ok_dec)\n"
    )
    env = dict(os.environ, FQZ5_NO_BZ2="1")
    subprocess.run([sys.executable, "-c", code], env=env, check=True,
                   timeout=120)


# ---------------- tok3 ----------------

@pytest.mark.parametrize("level", [3, 5, 7, 9])
@pytest.mark.parametrize("use_arith", [0, 1])
@pytest.mark.parametrize("style", ["illumina", "suffix", "srr", "mixed"])
def test_tok3_parity(level, use_arith, style):
    blk = make_names(200, style)
    ours = host.tok3_encode(blk, level, use_arith)
    assert host.tok3_decode(ours) == blk
    # use_arith>=5 levels include X_EXT (bzip2) methods; both sides now
    # run real bzip2 (ours via dlopen'd libbz2, the oracle harness via a
    # -DHAVE_LIBBZ2 arith_dynamic build), so parity holds everywhere.
    ref = oracle.tok3_enc(blk, level, use_arith)
    assert ours == ref, f"tok3 {style} L{level} arith={use_arith}"
    assert host.tok3_decode(ref) == blk
    assert oracle.tok3_dec(ours) == blk


def test_tok3_real_names(data_dir):
    # regression fixture names (pattern that segfaulted old versions)
    names = []
    with open(data_dir / "regression_srr1238539.fastq", "rb") as fp:
        for i, line in enumerate(fp):
            if i % 4 == 0:
                names.append(line.strip()[1:])
    blk = b"\x00".join(names) + b"\x00"
    for level in (3, 9):
        ours = host.tok3_encode(blk, level, 0)
        ref = oracle.tok3_enc(blk, level, 0)
        assert ours == ref
        assert host.tok3_decode(ref) == blk


# ---------------- fqz quality ----------------

def fqz_case(nrec=300, fixed=True, binned=False, r2=False):
    lens = np.full(nrec, 100, np.uint32) if fixed else \
        RNG.integers(50, 150, nrec).astype(np.uint32)
    total = int(lens.sum())
    if binned:
        q = RNG.choice(np.array([2, 12, 22, 37], np.uint8), total)
    else:
        q = np.clip(RNG.normal(30, 6, total), 0, 45).astype(np.uint8)
    flags = np.zeros(nrec, np.uint32)
    if r2:
        flags[1::2] = 128  # FQZ_FREAD2
        # make read-2 qualities systematically worse so the split helps
        off = 0
        for i, ln in enumerate(lens):
            if i % 2:
                qq = np.frombuffer(q, np.uint8).copy()
                qq[off:off + ln] = np.maximum(
                    qq[off:off + ln].astype(np.int16) - 8, 0).astype(np.uint8)
                q = qq.tobytes()
            off += int(ln)
    return lens, flags, bytes(q)


@pytest.mark.parametrize("strat", [0, 1, 2, 3])
@pytest.mark.parametrize("case", ["fixed", "var", "binned", "r2"])
def test_fqz_parity(strat, case):
    lens, flags, q = fqz_case(
        fixed=case in ("fixed", "binned", "r2"),
        binned=case == "binned", r2=case == "r2")
    ours = host.fqz_compress(q, lens, flags, None, strat)
    ref = oracle.fqz_enc(lens, flags, q, strat)
    assert ours == ref, f"fqz strat={strat} case={case}"
    assert host.fqz_decompress(ref, len(q)) == q
    assert oracle.fqz_dec(ours) == q


def test_fqz_dedup():
    # identical reads trigger the dedup path
    lens = np.full(100, 50, np.uint32)
    one = quals(50)
    q = one * 100
    flags = np.zeros(100, np.uint32)
    ours = host.fqz_compress(q, lens, flags, None, 0)
    ref = oracle.fqz_enc(lens, flags, q, 0)
    assert ours == ref
    assert host.fqz_decompress(ref, len(q)) == q


# ---------------- seq model ----------------

@pytest.mark.parametrize("ctx_size", [10, 12, 13])
@pytest.mark.parametrize("both", [0, 1])
def test_seq_roundtrip(ctx_size, both):
    lens = RNG.integers(50, 150, 100).astype(np.uint32)
    total = int(lens.sum())
    s = bytearray(dna(total))
    # sprinkle N runs and lowercase
    s[100:110] = b"N" * 10
    s[300:330] = dna(30).lower()
    s = bytes(s)
    comp = host.seq_encode(s, lens, both, ctx_size)
    got = host.seq_decode(comp, lens, both, ctx_size, total)
    assert got == s


def test_tok3_arith_no_heap_overflow():
    """Regression: tok3 with use_arith=1 on SRR-style names made the
    arith O1 coder write past its 1.05x output bound (heap
    corruption, caught by ASan).  The RangeCoder output-end guard
    (rc.h, mirroring reference c_range_coder.h RC_ShiftLowCheck) must
    make this a clean encode that still roundtrips."""
    import numpy as np

    rng = np.random.default_rng(3)
    lens = rng.integers(80, 320, 120_000)
    names = b"".join(
        b"SRR123.%d %d length=%d\x00" % (i, i, L)
        for i, L in enumerate(lens))
    from fqzcomp5_tpu.codecs import host

    comp = host.tok3_encode(names, 5, 1)
    assert host.tok3_decode(comp) == names
    comp0 = host.tok3_encode(names, 5, 0)
    assert host.tok3_decode(comp0) == names
