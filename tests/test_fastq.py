"""Parser/formatter semantics vs the reference kseq-based loader."""
import gzip
import io

import numpy as np

from fqzcomp5_tpu import fastq
from fqzcomp5_tpu.constants import FQZ_FREAD2


def parse_all(path, blk=1 << 30):
    p = fastq.Parser(fastq.open_input(str(path)))
    return p.next_batch(blk)


def test_sample_fastq(data_dir):
    b = parse_all(data_dir / "sample.fastq")
    assert b.num_records == 5
    assert not b.is_fasta
    names = b.names()
    assert names[0] == b"SEQ_ID_1"
    assert b.fixed_len == 60  # sample.fastq reads are all 60bp
    # qualities are stored rebased to -33
    q = np.frombuffer(b.qual_buf, np.uint8)
    assert q.max() < 94
    out = fastq.format_fastq(b)
    assert out == (data_dir / "sample.fastq").read_bytes()


def test_fasta(data_dir):
    b = parse_all(data_dir / "sample.fasta")
    assert b.is_fasta
    assert b.qual_buf == b""
    out = fastq.format_fasta(b)
    assert out == (data_dir / "sample.fasta").read_bytes()


def test_suffix_flags(data_dir):
    b = parse_all(data_dir / "single_with_suffix.fastq")
    # /1 and /2 suffixes: records ending /2 flagged FREAD2
    names = b.names()
    for nm, fl in zip(names, b.flags):
        assert (fl == FQZ_FREAD2) == nm.endswith(b"/2")


def test_duplicate_name_flags():
    data = b"@r1\nACGT\n+\n!!!!\n@r1\nACGT\n+\n!!!!\n"
    p = fastq.Parser(io.BytesIO(data))
    b = p.next_batch(1 << 20)
    assert list(b.flags) == [0, FQZ_FREAD2]


def test_block_packing_rule():
    # record size = name_core + 1 + seq + qual = 2+1+4+4 = 11
    data = b"@r1\nACGT\n+\n!!!!\n" * 10
    p = fastq.Parser(io.BytesIO(data))
    b1 = p.next_batch(23)  # fits 2 records (11+11 <= 23), 3rd would be 33
    assert b1.num_records == 2
    b2 = p.next_batch(23)
    assert b2.num_records == 2
    # tiny block still takes one record
    p2 = fastq.Parser(io.BytesIO(data))
    assert p2.next_batch(1).num_records == 1


def test_comment_handling():
    data = b"@r1 some comment\nAC\n+\n!!\n"
    p = fastq.Parser(io.BytesIO(data))
    b = p.next_batch(1 << 20)
    assert b.names() == [b"r1 some comment"]


def test_multiline_fasta():
    data = b">x\nACGT\nACGT\n>y\nTTTT\n"
    p = fastq.Parser(io.BytesIO(data))
    b = p.next_batch(1 << 20)
    assert b.num_records == 2
    assert b.seq_buf == b"ACGTACGTTTTT"
    assert list(b.lens) == [8, 4]


def test_gzip_input(tmp_path, data_dir):
    gz = tmp_path / "s.fastq.gz"
    gz.write_bytes(gzip.compress((data_dir / "sample.fastq").read_bytes()))
    b = parse_all(gz)
    assert b.num_records == 5


def test_interleave_and_split(data_dir):
    p = fastq.InterleavedParser(
        fastq.open_input(str(data_dir / "sample_R1.fastq")),
        fastq.open_input(str(data_dir / "sample_R2.fastq")),
    )
    b = p.next_batch(1 << 30)
    assert b.num_records == 6
    assert list(b.flags[::2]) == [0, 0, 0]
    assert list(b.flags[1::2]) == [FQZ_FREAD2] * 3
    r1, r2 = fastq.split_batch(b)
    assert fastq.format_fastq(r1) == (data_dir / "sample_R1.fastq").read_bytes()
    assert fastq.format_fastq(r2) == (data_dir / "sample_R2.fastq").read_bytes()


def test_compute_flags_zero_length_names():
    """Zero-length names must not break the vectorised dup detection
    (round-2 review finding: reduceat offset clamping merged
    segments and crashed on all-empty chunks)."""
    import numpy as np

    from fqzcomp5_tpu import fastq_fast
    from fqzcomp5_tpu.constants import FQZ_FREAD2

    def run_case(names):
        blob = b"".join(
            b"@" + nm + b"\nA\n+\nI\n" for nm in names)
        data = np.frombuffer(blob, np.uint8)
        r = fastq_fast.parse_chunk(data)
        assert r is not None
        recs, _ = r
        got = fastq_fast.compute_flags(data, recs)
        # per-record reference logic
        want = np.zeros(len(names), np.uint32)
        prev = None
        for i, nm in enumerate(names):
            if len(nm) > 1 and nm.endswith(b"/2"):
                want[i] = FQZ_FREAD2
            elif prev is not None and nm == prev:
                want[i] = FQZ_FREAD2
            prev = nm
        assert np.array_equal(got, want), names

    run_case([b"ab/2", b"ab", b"ab/2", b"", b"ba", b"ba", b""])
    run_case([b"", b"", b""])
    run_case([b"x", b"", b"x", b"x"])
    rng = np.random.default_rng(0)
    for _ in range(50):
        names = [bytes(rng.choice([65, 66, 47, 50], s))
                 for s in rng.integers(0, 4, rng.integers(1, 9))]
        run_case(names)


def test_format_fastq_native_matches_numpy_fallback():
    """The C fqz5_format_fastq kernel must agree with the numpy
    formatter on edge shapes: zero-length reads, empty names,
    plus_name, and varied record lengths."""
    from fqzcomp5_tpu import fastq_fast
    from fqzcomp5_tpu.codecs import native

    rng = np.random.default_rng(7)
    names, seqs, quals = [], [], []
    for i in range(50):
        nl = int(rng.integers(0, 30))
        names.append(bytes(rng.integers(33, 127, nl, dtype=np.uint8)
                           .tobytes().replace(b"\x00", b"A")))
        L = int(rng.integers(0, 40)) if i % 7 else 0
        seqs.append(rng.choice(np.frombuffer(b"ACGTN", np.uint8), L)
                    .astype(np.uint8).tobytes())
        quals.append(bytes(rng.integers(0, 60, L, dtype=np.uint8)))

    class B:
        num_records = len(names)
        name_buf = b"".join(n + b"\x00" for n in names)
        seq_buf = b"".join(seqs)
        qual_buf = b"".join(quals)
        lens = np.array([len(s) for s in seqs], np.uint32)
        is_fasta = False

    for plus in (False, True):
        got = native.format_fastq(B.name_buf, B.seq_buf, B.qual_buf,
                                  B.lens, plus)
        # reference: hand-rolled record assembly
        exp = b"".join(
            b"@" + n + b"\n" + s + b"\n+" + (n if plus else b"") + b"\n"
            + bytes(q + 33 for q in ql) + b"\n"
            for n, s, ql in zip(names, seqs, quals))
        assert got == exp, f"plus={plus}"


def test_format_fastq_native_rejects_missing_nul():
    import pytest

    from fqzcomp5_tpu.codecs import native

    with pytest.raises(ValueError):
        native.format_fastq(b"noterminator", b"ACGT", b"\x00\x00\x00\x00",
                            np.array([4], np.uint32), False)
