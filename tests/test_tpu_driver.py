"""TPU-engine CLI path (runs on the CPU backend in tests)."""
import numpy as np
import pytest

from fqzcomp5_tpu import cli


def make_fastq(tmp_path, n=3000):
    rng = np.random.default_rng(2)
    recs = []
    for i in range(n):
        nm = f"@T:{i % 3}:X:1:{1000 + i}:{rng.integers(1, 9999)}:42"
        seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 80)])
        q = (rng.normal(30, 5, 80).clip(0, 40) + 33).astype(
            np.uint8).tobytes().decode("latin1")
        recs.append(f"{nm}\n{seq}\n+\n{q}\n")
    p = tmp_path / "in.fastq"
    p.write_text("".join(recs))
    return p


def test_tpu_engine_roundtrip(tmp_path):
    src = make_fastq(tmp_path)
    comp = tmp_path / "c.fqz5"
    out = tmp_path / "o.fastq"
    assert cli.main(["-e", "tpu", "-V", str(src), str(comp)]) == 0
    # our tpu decode
    assert cli.main(["-e", "tpu", "-d", "-V", str(comp), str(out)]) == 0
    assert out.read_bytes() == src.read_bytes()
    # host decode of the tpu-encoded file (format compatibility)
    out2 = tmp_path / "o2.fastq"
    assert cli.main(["-d", "-V", str(comp), str(out2)]) == 0
    assert out2.read_bytes() == src.read_bytes()
    assert cli.main(["--check", str(comp)]) == 0


def test_tpu_decode_of_host_file(tmp_path):
    src = make_fastq(tmp_path, 1000)
    comp = tmp_path / "c.fqz5"
    out = tmp_path / "o.fastq"
    assert cli.main(["-1", "-V", str(src), str(comp)]) == 0
    assert cli.main(["-e", "tpu", "-d", "-V", str(comp), str(out)]) == 0
    assert out.read_bytes() == src.read_bytes()


def test_tpu_engine_fasta(tmp_path):
    p = tmp_path / "in.fasta"
    rng = np.random.default_rng(4)
    recs = []
    for i in range(500):
        seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 120)])
        recs.append(f">chr{i}\n{seq}\n")
    p.write_text("".join(recs))
    comp = tmp_path / "c.fqz5"
    out = tmp_path / "o.fasta"
    assert cli.main(["-e", "tpu", "-V", str(p), str(comp)]) == 0
    assert cli.main(["-d", "-V", str(comp), str(out)]) == 0
    assert out.read_bytes() == p.read_bytes()
