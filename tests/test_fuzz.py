"""Seeded mini-fuzz: random valid inputs must round-trip; random
corruptions must fail cleanly (ERROR + nonzero exit, never a crash).

The reference lists fuzzing as a TODO (README.md:615) and relies on
upstream oss-fuzz for htscodecs; this gives the framework its own
bounded, deterministic coverage.
"""

import numpy as np
import pytest

from fqzcomp5_tpu import cli
from fqzcomp5_tpu.codecs import host


def _rand_fastq(rng, nrec, exotic=False):
    out = []
    for i in range(nrec):
        ln = int(rng.integers(1, 200))
        name = b"@r%d" % i
        if rng.random() < 0.5:
            name += b" c%d x" % (i % 7)
        if exotic and rng.random() < 0.2:
            name += b"/2" if i % 2 else b"/1"
        seq = rng.choice(list(b"ACGTNacgtn"), ln).astype(np.uint8)
        qual = rng.integers(33, 105, ln).astype(np.uint8)
        out.append(name + b"\n" + seq.tobytes() + b"\n+\n"
                   + qual.tobytes() + b"\n")
    return b"".join(out)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_roundtrip(tmp_path, seed):
    rng = np.random.default_rng(seed)
    data = _rand_fastq(rng, int(rng.integers(1, 400)), exotic=True)
    src = tmp_path / "f.fastq"
    src.write_bytes(data)
    comp = tmp_path / "f.fqz5"
    out = tmp_path / "f.out"
    level = int(rng.choice([1, 3, 5]))
    assert cli.main([f"-{level}", "-V", "-b", "1M",
                     str(src), str(comp)]) == 0
    assert cli.main(["-d", "-V", str(comp), str(out)]) == 0
    assert out.read_bytes() == data


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_corruption_no_crash(tmp_path, seed, capsys):
    rng = np.random.default_rng(100 + seed)
    data = _rand_fastq(rng, 200)
    src = tmp_path / "f.fastq"
    src.write_bytes(data)
    comp = tmp_path / "f.fqz5"
    assert cli.main(["-1", "-V", str(src), str(comp)]) == 0
    raw = bytearray(comp.read_bytes())
    # random byte stomps (skip the magic so the file parses as FQZ5)
    for _ in range(int(rng.integers(1, 6))):
        pos = int(rng.integers(8, len(raw)))
        raw[pos] = int(rng.integers(0, 256))
    bad = tmp_path / "bad.fqz5"
    bad.write_bytes(bytes(raw))
    rc = cli.main(["-d", "-V", str(bad), str(tmp_path / "x.out")])
    if rc != 0:
        assert "ERROR:" in capsys.readouterr().err
    # rc == 0 is possible when the stomps miss coded payloads entirely


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_codec_garbage_inputs(seed):
    """Raw garbage fed to decoders must raise, not crash."""
    rng = np.random.default_rng(200 + seed)
    blob = rng.integers(0, 256, int(rng.integers(4, 5000))) \
        .astype(np.uint8).tobytes()
    for fn in (lambda: host.rans_uncompress(blob),
               lambda: host.arith_uncompress(blob),
               lambda: host.tok3_decode(blob),
               lambda: host.fqz_decompress(blob, 1000),
               lambda: host.unlzp(blob, 1000)):
        try:
            fn()
        except (ValueError, IndexError):
            pass
