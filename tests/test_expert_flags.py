"""Expert-flag byte parity vs the reference binary (fqzcomp5.c:4934-4962).

Each case encodes the same input with our CLI and the reference build
and requires identical compressed bytes, then round-trips.  Skipped
when the oracle isn't built (tools/oracle/build.sh)."""

import subprocess

import pytest

from fqzcomp5_tpu import cli
from tests import oracle_util

pytestmark = pytest.mark.skipif(
    not oracle_util.FQZ5_BIN.exists(), reason="reference binary not built")

CASES = [
    ["-1", "-n", "0"],           # names: rANS
    ["-1", "-n", "1"],           # names: tok3
    ["-1", "-n", "2"],           # names: tok3 + LZP comments
    ["-1", "-n", "1", "-N", "7"],
    ["-3", "-s", "0"],           # seq: plain rANS
    ["-3", "-s", "1", "-S", "11"],   # seq: custom context size
    ["-3", "-s", "1", "-S", "12", "-B"],  # both strands
    ["-1", "-q", "0"],           # qual: rANS
    ["-1", "-q", "1"],           # qual: fqz
    ["-1", "-q", "1", "-Q", "2"],
    ["-3", "-b", "2K"],          # block size (clamped to 1MB)
]


@pytest.mark.parametrize("flags", CASES, ids=[" ".join(c) for c in CASES])
def test_expert_flag_parity(tmp_path, data_dir, flags):
    src = data_dir / "regression_srr1238539.fastq"
    ours = tmp_path / "ours.fqz5"
    ref = tmp_path / "ref.fqz5"
    assert cli.main([*flags, "-V", "-t", "1", str(src), str(ours)]) == 0
    subprocess.run([str(oracle_util.FQZ5_BIN), *flags, "-t", "1",
                    str(src), str(ref)],
                   check=True, capture_output=True)
    assert ours.read_bytes() == ref.read_bytes(), f"flags {flags}"
    out = tmp_path / "out.fastq"
    assert cli.main(["-d", "-V", str(ours), str(out)]) == 0
    assert out.read_bytes() == src.read_bytes()


def test_preset_parity_fasta(tmp_path, data_dir):
    src = data_dir / "sample.fasta"
    for lvl in ("-1", "-5"):
        ours = tmp_path / "o.fqz5"
        ref = tmp_path / "r.fqz5"
        assert cli.main([lvl, "-V", str(src), str(ours)]) == 0
        subprocess.run([str(oracle_util.FQZ5_BIN), lvl, str(src), str(ref)],
                       check=True, capture_output=True)
        assert ours.read_bytes() == ref.read_bytes(), lvl
