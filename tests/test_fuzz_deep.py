"""Deterministic byte-flip fuzz sweeps over every decoder entry point.

For each codec family a small corpus of VALID payloads is built with
the encoder, then systematically corrupted (single-byte flips at a
seeded position sample, plus truncations) and fed to the decoder.
The contract: decoders either succeed (a flip may land in slack) or
fail cleanly with ValueError/IndexError-class errors — never crash,
never hang (each call runs under a SIGALRM deadline).

Covers: rANS 4x16/32x16 all order-byte modes (O0/O1, PACK, RLE, CAT,
STRIPE), arith_dynamic, tok3, name wrapper strategies, LZP, fqz-qual,
SEQ context codec, and the container/block walk via the CLI.
"""

import signal

import numpy as np
import pytest

from fqzcomp5_tpu import cli, names
from fqzcomp5_tpu.codecs import host

ACCEPT = (ValueError, IndexError, KeyError, OverflowError,
          MemoryError, struct_error := __import__("struct").error)


class Deadline:
    """SIGALRM guard: a decoder that spins > seconds fails the test."""

    def __init__(self, seconds=10):
        self.seconds = seconds

    def __enter__(self):
        def _raise(sig, frm):
            raise AssertionError("decoder hang (deadline expired)")

        self._old = signal.signal(signal.SIGALRM, _raise)
        signal.alarm(self.seconds)

    def __exit__(self, *exc):
        signal.alarm(0)
        signal.signal(signal.SIGALRM, self._old)


def _flip_positions(rng, n, k=40):
    """Deterministic sample of flip positions covering head, tail and
    body of an n-byte payload."""
    if n == 0:
        return []
    head = list(range(min(8, n)))
    tail = list(range(max(n - 4, 0), n))
    body = list(rng.integers(0, n, min(k, n)))
    return sorted(set(head + tail + [int(x) for x in body]))


def _sweep(payload: bytes, decode, rng):
    """Run decode over single-byte corruptions + truncations."""
    for pos in _flip_positions(rng, len(payload)):
        bad = bytearray(payload)
        bad[pos] ^= int(rng.integers(1, 256))
        with Deadline():
            try:
                decode(bytes(bad))
            except ACCEPT:
                pass
    for cut in {0, 1, len(payload) // 2, max(len(payload) - 1, 0)}:
        with Deadline():
            try:
                decode(payload[:cut])
            except ACCEPT:
                pass


def _qual_block(rng, nrec=60):
    lens = rng.integers(1, 120, nrec).astype(np.uint32)
    total = int(lens.sum())
    q = np.clip(np.cumsum(rng.integers(-2, 3, total)) % 40 + 3,
                0, 45).astype(np.uint8)
    return bytes(q), lens


@pytest.mark.parametrize("order", [0, 1, 0x40, 0x41, 0x80, 0x81,
                                   0xC0, 0xC1, 0x04, 0x05, 0x20,
                                   (8 << 8) | 9])
def test_fuzz_rans_orders(order):
    rng = np.random.default_rng(order + 1)
    data = bytes(rng.choice(np.frombuffer(b"ACGTN", np.uint8), 4096))
    payload = host.rans_compress(data, order)
    _sweep(payload, lambda p: host.rans_uncompress(p, out_hint=4096),
           rng)


@pytest.mark.parametrize("order", [0, 1, 0x40, 0x41, 0x80, 0x81,
                                   0x04, 0x84])  # X_EXT bzip2 paths
def test_fuzz_arith_orders(order):
    rng = np.random.default_rng(order + 31)
    data = bytes(rng.integers(33, 74, 3000).astype(np.uint8))
    payload = host.arith_compress(data, order)
    _sweep(payload, host.arith_uncompress, rng)


@pytest.mark.parametrize("strat,level", [(0, 3), (1, 5), (2, 7)])
def test_fuzz_name_strategies(strat, level):
    rng = np.random.default_rng(strat * 10 + level)
    nm = b"\x00".join(
        b"SRR%d.%d %d length=%d" % (level, i, i, int(rng.integers(99)))
        for i in range(200)) + b"\x00"
    framed = names.encode_names(nm, strat, level)
    # framing: [u32 ulen][u8 strat][u32 clen][inner]
    import struct

    ulen, wstrat, clen = struct.unpack_from("<IBI", framed, 0)
    inner = framed[9:9 + clen]
    _sweep(inner,
           lambda p: names.decode_names(p, len(p), ulen, wstrat),
           rng)


def test_fuzz_lzp():
    rng = np.random.default_rng(77)
    data = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 8000))
    payload = host.lzp(data)
    _sweep(payload, lambda p: host.unlzp(p, len(data)), rng)


@pytest.mark.parametrize("strat", [0, 1, 3])
def test_fuzz_fqz_strats(strat):
    rng = np.random.default_rng(400 + strat)
    q, lens = _qual_block(rng)
    seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), len(q)))
    sb = seq if strat >= 3 else None
    payload = host.fqz_compress(q, lens, np.zeros(len(lens),
                                                  np.uint32), sb,
                                strat)
    _sweep(payload,
           lambda p: host.fqz_decompress(p, len(q), seq_buf=sb), rng)


@pytest.mark.parametrize("slevel,both", [(10, 0), (12, 1)])
def test_fuzz_seq_codec(slevel, both):
    rng = np.random.default_rng(500 + slevel)
    lens = rng.integers(20, 150, 80).astype(np.uint32)
    total = int(lens.sum())
    seq = bytes(rng.choice(np.frombuffer(b"ACGTNacgt\x7f", np.uint8),
                           total))
    payload = host.seq_encode(seq, lens, both, slevel)
    _sweep(payload,
           lambda p: host.seq_decode(p, lens, both, slevel, total),
           rng)


def test_fuzz_container_block_walk(tmp_path, capsys):
    """Byte-flip the whole archive (post-magic) and drive the full CLI
    decode: every outcome must be clean exit 0/1, never a traceback."""
    rng = np.random.default_rng(900)
    recs = []
    for i in range(300):
        ln = int(rng.integers(1, 120))
        seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), ln)
        qual = rng.integers(33, 74, ln).astype(np.uint8)
        recs.append(b"@r%d x%d\n" % (i, i) + seq.tobytes() + b"\n+\n"
                    + qual.tobytes() + b"\n")
    src = tmp_path / "s.fastq"
    src.write_bytes(b"".join(recs))
    comp = tmp_path / "c.fqz5"
    assert cli.main(["-3", "-V", "-b", "1M", str(src),
                     str(comp)]) == 0
    raw = comp.read_bytes()
    for pos in _flip_positions(rng, len(raw), k=60):
        if pos < 8:
            continue  # magic: rejected upfront, separate path
        bad = bytearray(raw)
        bad[pos] ^= int(rng.integers(1, 256))
        badf = tmp_path / "bad.fqz5"
        badf.write_bytes(bytes(bad))
        with Deadline(20):
            rc = cli.main(["-d", "-V", str(badf),
                           str(tmp_path / "x.out")])
        assert rc in (0, 1)
        capsys.readouterr()
        # --check must also stay clean
        with Deadline(20):
            rc = cli.main(["--check", str(badf)])
        assert rc in (0, 1)
        capsys.readouterr()


# ---------------------------------------------------------------------
# Structure-aware container fuzz (round-3): mutate SEMANTIC fields —
# section lengths, strat bytes, record counts, index offset — and
# RECOMPUTE the block CRC, so the mutation penetrates past the CRC
# gate into the section decoders (a plain byte flip is usually caught
# by the CRC and never reaches them).

def _first_block_span(raw: bytes) -> tuple[int, int]:
    """(start, end) byte span of the first block in a v1.1 file."""
    import struct

    start = 8 + 8  # MAGIC_LEN + u64 index-offset
    (bsz,) = struct.unpack_from("<I", raw, start)
    return start, start + 4 + bsz


def _refix(raw: bytearray, start: int) -> None:
    """Recompute the first block's CRC over its (mutated) payload so
    the mutation reaches the section decoders."""
    import struct
    import zlib

    (bsz,) = struct.unpack_from("<I", raw, start)
    end = min(start + 4 + bsz, len(raw))
    crc = zlib.crc32(bytes(raw[start + 12:end])) & 0xFFFFFFFF
    struct.pack_into("<I", raw, start + 8, crc)


def test_fuzz_container_structure(tmp_path, capsys):
    import struct

    rng = np.random.default_rng(901)
    recs = []
    for i in range(400):
        ln = int(rng.integers(1, 120))
        seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), ln)
        qual = rng.integers(33, 74, ln).astype(np.uint8)
        recs.append(b"@r%d x%d\n" % (i, i) + seq.tobytes() + b"\n+\n"
                    + qual.tobytes() + b"\n")
    src = tmp_path / "s.fastq"
    src.write_bytes(b"".join(recs))
    comp = tmp_path / "c.fqz5"
    assert cli.main(["-3", "-V", "-b", "8K", str(src),
                     str(comp)]) == 0
    raw = comp.read_bytes()
    bstart, bend = _first_block_span(raw)

    def drive(mutant: bytes):
        badf = tmp_path / "bad.fqz5"
        badf.write_bytes(mutant)
        with Deadline(20):
            rc = cli.main(["-d", "-V", str(badf),
                           str(tmp_path / "x.out")])
        assert rc in (0, 1)
        capsys.readouterr()
        with Deadline(20):
            rc = cli.main(["--check", str(badf)])
        assert rc in (0, 1)
        with Deadline(20):
            rc = cli.main(["--inspect", str(badf)])
        assert rc in (0, 1)
        capsys.readouterr()

    # header-level: index offset into the void / mid-block / tiny
    for off in (0xFFFFFFFFFFFF, len(raw) + 1, bstart + 7, 13, 1):
        bad = bytearray(raw)
        struct.pack_into("<Q", bad, 8, off)
        drive(bytes(bad))

    # block-size / nrec mutations (CRC refixed where it applies)
    for field_off, vals in ((bstart, (0, 1, 11, 1 << 30)),
                            (bstart + 4, (0, 1, 399, 1 << 30))):
        for v in vals:
            bad = bytearray(raw)
            struct.pack_into("<I", bad, field_off, v)
            if field_off != bstart:
                _refix(bad, bstart)
            drive(bytes(bad))

    # names section: [u32 ulen][u8 strat][u32 clen] right after the
    # 12-byte block header
    noff = bstart + 12
    (nclen,) = struct.unpack_from("<I", raw, noff + 5)
    for (at, size, vals) in (
            (noff, 4, (0, 1, 0xFFFFFF, 1 << 31)),          # ulen
            (noff + 4, 1, (0, 1, 2, 3, 7, 0xFF)),          # strat
            (noff + 5, 4, (0, 1, nclen - 1, nclen + 1,
                           0xFFFFFF)),                     # clen
    ):
        for v in vals:
            bad = bytearray(raw)
            if size == 4:
                struct.pack_into("<I", bad, at, v & 0xFFFFFFFF)
            else:
                bad[at] = v & 0xFF
            _refix(bad, bstart)
            drive(bytes(bad))

    # seq/qual section strat+len mutations: walk the block layout
    off = noff + 9 + nclen
    lstrat = raw[off]   # fixed: varint byte count; 0: varint list
    off += 1
    if lstrat > 0:
        off += lstrat
    else:
        (blen,) = struct.unpack_from("<I", raw, off)
        off += 4 + blen
    for _sec in ("seq", "qual"):
        (s_ulen, s_clen) = struct.unpack_from("<II", raw, off + 1)
        for (at, size, vals) in (
                (off, 1, (0, 1, 3, 0x15, 0x21, 0x31, 0xC1, 0xFF)),
                (off + 1, 4, (0, 1, s_ulen + 1, 1 << 31)),
                (off + 5, 4, (0, 1, s_clen - 1, s_clen + 1,
                              0xFFFFFF)),
        ):
            for v in vals:
                bad = bytearray(raw)
                if size == 4:
                    struct.pack_into("<I", bad, at, v & 0xFFFFFFFF)
                else:
                    bad[at] = v & 0xFF
                _refix(bad, bstart)
                drive(bytes(bad))
        off += 9 + s_clen


@pytest.mark.slow
def test_fuzz_wave_archive_random(tmp_path):
    """Seeded random corruption sweep over a WAVE-ENGINE archive
    (stripe/pack section parsers: _parse_stripe_job/_parse_device_job
    are hand-written and bounds-checked by hand).  Round-5 campaign:
    60/60 random multi-flip/truncation corruptions rejected cleanly
    with no crash or hang; this pins a 12-case subset."""
    import random

    from fqzcomp5_tpu import cli

    rng = np.random.default_rng(9)
    recs = []
    for i in range(400):
        s = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 64)])
        q = (rng.integers(35, 45, 64)).astype(
            np.uint8).tobytes().decode("latin1")
        recs.append(f"@W{i}\n{s}\n+\n{q}\n")
    src = tmp_path / "w.fq"
    src.write_text("".join(recs))
    comp = tmp_path / "w.fqz5"
    assert cli.main(["-e", "tpu", "-b", "16K", str(src),
                     str(comp)]) == 0
    arc = comp.read_bytes()
    random.seed(5)
    bad = tmp_path / "bad.fqz5"
    out = tmp_path / "bad.out"
    for it in range(12):
        b = bytearray(arc)
        for _ in range(random.choice((1, 2, 8))):
            b[random.randrange(len(b))] = random.randrange(256)
        if it % 4 == 3:
            b = b[:random.randrange(64, len(b))]
        bad.write_bytes(bytes(b))
        # must reject cleanly (rc 1) or, for benign flips, decode
        rc = cli.main(["-e", "tpu", "-d", str(bad), str(out)])
        assert rc in (0, 1)
