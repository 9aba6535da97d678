"""End-to-end CLI tests mirroring the reference test.sh groups, plus
byte-parity against reference-produced golden files."""
import gzip
import io
import subprocess
import sys

import pytest

from fqzcomp5_tpu import cli

RUN = [sys.executable, "-m", "fqzcomp5_tpu.cli"]


def run_cli(args):
    """In-process CLI invocation (fast); returns exit code."""
    return cli.main(args)


def roundtrip(tmp_path, src, level, extra=()):
    comp = tmp_path / "c.fqz5"
    out = tmp_path / "out.fastq"
    assert run_cli([f"-{level}", "-V", "-t", "2", *extra,
                    str(src), str(comp)]) == 0
    assert run_cli(["-d", "-V", str(comp), str(out)]) == 0
    assert out.read_bytes() == src.read_bytes()
    return comp


# Group 1: single-file roundtrips at all levels
@pytest.mark.parametrize("level", [1, 3, 5])
def test_roundtrip_levels(tmp_path, data_dir, level):
    comp = roundtrip(tmp_path, data_dir / "sample.fastq", level)
    golden = data_dir / "golden" / f"sample.L{level}.fqz5"
    assert comp.read_bytes() == golden.read_bytes(), \
        "compressed bytes differ from reference"


@pytest.mark.slow
@pytest.mark.parametrize("level", [7, 9])
def test_roundtrip_levels_slow(tmp_path, data_dir, level):
    comp = roundtrip(tmp_path, data_dir / "sample.fastq", level)
    golden = data_dir / "golden" / f"sample.L{level}.fqz5"
    assert comp.read_bytes() == golden.read_bytes()


def test_suffix_roundtrip(tmp_path, data_dir):
    roundtrip(tmp_path, data_dir / "single_with_suffix.fastq", 5)


# Group 2: paired-end interleave / deinterleave
def test_paired_roundtrip(tmp_path, data_dir):
    comp = tmp_path / "p.fqz5"
    assert run_cli(["-5", "-V", "-t", "2",
                    str(data_dir / "sample_R1.fastq"),
                    str(data_dir / "sample_R2.fastq"), str(comp)]) == 0
    assert comp.read_bytes() == \
        (data_dir / "golden" / "paired.L5.fqz5").read_bytes()
    o1, o2 = tmp_path / "r1.fastq", tmp_path / "r2.fastq"
    assert run_cli(["-d", "-V", str(comp), str(o1), str(o2)]) == 0
    assert o1.read_bytes() == (data_dir / "sample_R1.fastq").read_bytes()
    assert o2.read_bytes() == (data_dir / "sample_R2.fastq").read_bytes()


def test_paired_nosuffix(tmp_path, data_dir):
    """Suffix-less pairing exercises the strat-2 flags stream."""
    comp = tmp_path / "p.fqz5"
    assert run_cli(["-5", "-V", "-t", "2",
                    str(data_dir / "paired_R1_nosuffix.fastq"),
                    str(data_dir / "paired_R2_nosuffix.fastq"),
                    str(comp)]) == 0
    o1, o2 = tmp_path / "r1.fastq", tmp_path / "r2.fastq"
    assert run_cli(["-d", "-V", str(comp), str(o1), str(o2)]) == 0
    assert o1.read_bytes() == \
        (data_dir / "paired_R1_nosuffix.fastq").read_bytes()
    assert o2.read_bytes() == \
        (data_dir / "paired_R2_nosuffix.fastq").read_bytes()


# Group 3: gzip in / out
def test_gzip_io(tmp_path, data_dir):
    src = data_dir / "sample.fastq"
    gz = tmp_path / "s.fastq.gz"
    gz.write_bytes(gzip.compress(src.read_bytes()))
    comp = tmp_path / "c.fqz5"
    assert run_cli(["-3", "-V", str(gz), str(comp)]) == 0
    out_gz = tmp_path / "out.fastq.gz"
    assert run_cli(["-d", "-V", str(comp), str(out_gz)]) == 0
    assert gzip.decompress(out_gz.read_bytes()) == src.read_bytes()


def test_gz_output_bytes_match_reference(tmp_path, data_dir):
    """.gz CONTAINER bytes (not just content) match the reference
    binary's gzwrite output: header 1f8b 08 00 mtime=0 xfl=0 os=3 +
    one zlib level-6 deflate stream (GzExactWriter)."""
    from tests import oracle_util

    if not oracle_util.FQZ5_BIN.exists():
        import pytest
        pytest.skip("reference binary not built")
    import subprocess
    src = data_dir / "sample.fastq"
    comp = tmp_path / "c.fqz5"
    assert run_cli(["-1", "-V", str(src), str(comp)]) == 0
    ref_gz = tmp_path / "ref.fastq.gz"
    subprocess.run([str(oracle_util.FQZ5_BIN), "-d", str(comp),
                    str(ref_gz)], check=True, capture_output=True)
    our_gz = tmp_path / "our.fastq.gz"
    assert run_cli(["-d", "-V", str(comp), str(our_gz)]) == 0
    assert our_gz.read_bytes() == ref_gz.read_bytes()


# Group 4: -p plus-name, -b block size, threads
def test_plus_name(tmp_path, data_dir):
    src = data_dir / "sample.fastq"
    comp = tmp_path / "c.fqz5"
    out = tmp_path / "o.fastq"
    assert run_cli(["-1", "-V", str(src), str(comp)]) == 0
    assert run_cli(["-d", "-p", "-V", str(comp), str(out)]) == 0
    lines = out.read_bytes().split(b"\n")
    assert lines[2] == b"+" + lines[0][1:]


def test_small_blocks(tmp_path, data_dir):
    src = data_dir / "paired_R1_nosuffix.fastq"
    comp = tmp_path / "c.fqz5"
    out = tmp_path / "o.fastq"
    assert run_cli(["-1", "-V", "-b", "1K", "-t", "3",
                    str(src), str(comp)]) == 0
    assert run_cli(["-d", "-V", "-t", "3", str(comp), str(out)]) == 0
    assert out.read_bytes() == src.read_bytes()
    # -b 1K clamps to 1MB (fqzcomp5.c:4880), so still one block here


# Group 5: format validation
def test_magic_bytes(tmp_path, data_dir):
    comp = roundtrip(tmp_path, data_dir / "sample.fastq", 1)
    data = comp.read_bytes()
    assert data[:8] == b"FQZ5\x01\x01\x00\x00"
    assert b"FQZ5IDX\x00" in data


# Group 6: integrity
def test_check_ok(tmp_path, data_dir, capsys):
    comp = roundtrip(tmp_path, data_dir / "sample.fastq", 1)
    assert run_cli(["--check", str(comp)]) == 0
    assert "SUCCESS" in capsys.readouterr().out


def test_check_corruption(tmp_path, data_dir, capsys):
    comp = roundtrip(tmp_path, data_dir / "sample.fastq", 1)
    raw = bytearray(comp.read_bytes())
    raw[60] ^= 0xFF
    bad = tmp_path / "bad.fqz5"
    bad.write_bytes(bytes(raw))
    assert run_cli(["--check", str(bad)]) == 1
    # decompression must also fail loudly (ERROR: + exit 1), not crash
    assert cli.main(["-d", "-V", str(bad), str(tmp_path / "x.fastq")]) == 1
    err = capsys.readouterr().err
    assert "ERROR:" in err


def test_decode_truncated_and_oversized(tmp_path, data_dir, capsys):
    """Truncated archives (struct.error) and oversized section lengths
    (IndexError) must print ERROR: + exit 1, never a traceback
    (round-1 advisor finding; reference prints ERROR: and aborts)."""
    comp = roundtrip(tmp_path, data_dir / "sample.fastq", 1)
    raw = comp.read_bytes()

    trunc = tmp_path / "trunc.fqz5"
    trunc.write_bytes(raw[:12])
    assert cli.main(["-d", "-V", str(trunc),
                     str(tmp_path / "t.fastq")]) == 1
    assert "ERROR:" in capsys.readouterr().err

    # stomp a plausible length field with a huge value
    big = bytearray(raw)
    big[40:44] = (0x7FFFFFFF).to_bytes(4, "little")
    bad = tmp_path / "big.fqz5"
    bad.write_bytes(bytes(big))
    assert cli.main(["-d", "-V", str(bad),
                     str(tmp_path / "b.fastq")]) == 1
    assert "ERROR:" in capsys.readouterr().err


def test_check_legacy_no_crc(data_dir, capsys):
    assert run_cli(["--check", str(data_dir / "sample.fqz5")]) == 1


# Group 7: inspect
def test_inspect_fields(tmp_path, data_dir, capsys):
    comp = roundtrip(tmp_path, data_dir / "sample.fastq", 3)
    assert run_cli(["--inspect", str(comp)]) == 0
    out = capsys.readouterr().out
    for field in ["Format Version", "Compressed Size", "Number of Blocks",
                  "Total Records", "Index Present", "Integrity Check"]:
        assert field in out
    assert "1.1 (current)" in out


def test_inspect_legacy(data_dir, capsys):
    run_cli(["--inspect", str(data_dir / "sample.fqz5")])
    out = capsys.readouterr().out
    assert "1.0 (legacy)" in out


# Group 8: regression + FASTA
def test_srr_regression(tmp_path, data_dir):
    for level in (3, 5):
        comp = roundtrip(tmp_path, data_dir / "regression_srr1238539.fastq",
                         level, extra=("-b", "1M"))
        if level == 5:
            golden = data_dir / "golden" / "srr.L5.fqz5"
            assert comp.read_bytes() == golden.read_bytes()


def test_fasta_roundtrip(tmp_path, data_dir):
    src = data_dir / "sample.fasta"
    comp = tmp_path / "c.fqz5"
    out = tmp_path / "o.fasta"
    assert run_cli(["-3", "-V", str(src), str(comp)]) == 0
    assert comp.read_bytes() == \
        (data_dir / "golden" / "sample.fasta.L3.fqz5").read_bytes()
    assert run_cli(["-d", "-V", str(comp), str(out)]) == 0
    assert out.read_bytes() == src.read_bytes()


def test_fasta_paired(tmp_path, data_dir):
    comp = tmp_path / "c.fqz5"
    assert run_cli(["-3", "-V", str(data_dir / "paired_R1.fasta"),
                    str(data_dir / "paired_R2.fasta"), str(comp)]) == 0
    o1, o2 = tmp_path / "r1.fasta", tmp_path / "r2.fasta"
    assert run_cli(["-d", "-V", str(comp), str(o1), str(o2)]) == 0
    assert o1.read_bytes() == (data_dir / "paired_R1.fasta").read_bytes()
    assert o2.read_bytes() == (data_dir / "paired_R2.fasta").read_bytes()


# Legacy v1.0 decode parity
def test_legacy_v10_decode(tmp_path, data_dir):
    out = tmp_path / "legacy.fastq"
    assert run_cli(["-d", "-V", str(data_dir / "sample.fqz5"),
                    str(out)]) == 0
    body = out.read_bytes()
    assert body.startswith(b"@SEQ_ID_1\n")
    assert body.count(b"\n@") + 1 == 5  # five records


# Mixed-comment strat-2 (upstream bug we fix; see names.py)
def test_mixed_comments_strat2(tmp_path):
    src = tmp_path / "mixed.fastq"
    recs = []
    for i in range(50):
        nm = f"@r{i} comment{i}" if i % 2 == 0 else f"@r{i}"
        recs.append(f"{nm}\nACGT\n+\n!!!!\n")
    src.write_text("".join(recs))
    comp = tmp_path / "c.fqz5"
    out = tmp_path / "o.fastq"
    assert run_cli(["-n", "2", "-V", str(src), str(comp)]) == 0
    assert run_cli(["-d", "-V", str(comp), str(out)]) == 0
    assert out.read_bytes() == src.read_bytes()


# Verbose-report parity: sizes and method ids must match the reference
# field-for-field (times vary).
def test_verbose_report_fields(tmp_path, data_dir, capsys):
    import re

    comp = tmp_path / "c.fqz5"
    assert cli.main(["-3", "-v", "-t", "1",
                     str(data_dir / "sample.fastq"), str(comp)]) == 0
    err = capsys.readouterr().err
    # per-block trace lines (fqzcomp5.c:1875-1884 format)
    m = re.search(r"Names\s+(\d+) to\s+(\d+) in [\d.]+ sec method (\d+)",
                  err)
    assert m, err
    assert m.group(1) == "45"      # sample.fastq name bytes
    m = re.search(r"Lengths\s+(\d+) to\s+(\d+) in [\d.]+ sec method (\d+)",
                  err)
    assert m, err
    # final aggregate (fqzcomp5.c:5270-5280 format)
    assert re.search(r"All 1 blocks combined:", err)
    assert re.search(r"Seqs\s+300 to\s+\d+ in [\d.]+ sec", err)

    # decode report swaps the size columns
    out = tmp_path / "o.fastq"
    assert cli.main(["-d", "-v", str(comp), str(out)]) == 0
    err = capsys.readouterr().err
    m = re.search(r"Names\s+(\d+) to\s+(\d+) in", err)
    assert m and m.group(2) == "45", err


def test_pipe_chain_roundtrip(data_dir, tmp_path):
    """encode | decode through TRUE pipes roundtrips (round 5).

    The container index lives at a header-patched offset, so decode
    needs a seek; the CLI spools non-seekable stdin to a temp file.
    BEYOND PARITY: the reference binary silently decodes 0 blocks
    from a pipe (its fseek fails and it writes empty output)."""
    import subprocess
    import sys

    sample = (data_dir / "sample.fastq").read_bytes()
    env = dict(__import__("os").environ)
    env["FQZ5_NO_DAEMON"] = "1"  # exercise the in-process CLI path
    enc = subprocess.run(
        [sys.executable, "-m", "fqzcomp5_tpu.cli", "-1"],
        input=sample, stdout=subprocess.PIPE, env=env,
        stderr=subprocess.DEVNULL, check=True)
    assert enc.stdout[:4] == b"FQZ5"
    # feed the archive through a REAL pipe (not a seekable redirect)
    dec = subprocess.run(
        [sys.executable, "-m", "fqzcomp5_tpu.cli", "-d"],
        input=enc.stdout, stdout=subprocess.PIPE, env=env,
        stderr=subprocess.DEVNULL, check=True)
    assert dec.stdout == sample
