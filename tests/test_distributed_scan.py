"""Parse-once distribution: the byte-range pre-scan (fastq.scan_blocks)
must reproduce the streaming parser's block packing exactly, owners
must parse only ~input/N bytes each (VERDICT r2 item 3), and inputs the
scanner cannot split (gzip) must fall back to the replicated path with
identical output."""

import gzip
import io
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_fastq(path, n=3000, seed=5, var_len=False):
    rng = np.random.default_rng(seed)
    chrom = rng.choice(np.frombuffer(b"ACGT", np.uint8), 30000)
    recs = []
    for i in range(n):
        L = int(rng.integers(40, 200)) if var_len else 90
        off = int(rng.integers(0, len(chrom) - L))
        q = (np.clip(rng.normal(32, 4, L), 2, 40) + 33).astype(np.uint8)
        name = b"@blk%d some comment %d\n" % (i, i) if i % 3 else \
            b"@blk%d/2\n" % i
        recs.append(name + chrom[off:off + L].tobytes()
                    + b"\n+\n" + q.tobytes() + b"\n")
    data = b"".join(recs)
    path.write_bytes(data)
    return data


def _launch(nprocs, args, extra_env=None, timeout=300):
    port = _free_port()
    procs = []
    for pid in range(nprocs):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "",
            "FQZ5_DIST_COORD": f"127.0.0.1:{port}",
            "FQZ5_DIST_NPROCS": str(nprocs),
            "FQZ5_DIST_PID": str(pid),
            "PYTHONPATH": os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
        })
        env.update(extra_env or {})
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "fqzcomp5_tpu.parallel.distributed"]
            + args, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE))
    outs = [p.communicate(timeout=timeout) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    return outs


def test_scan_blocks_matches_parser(tmp_path):
    """Every scanned byte range re-parses to exactly the batch the
    streaming Parser produces (boundaries, lens, flags, buffers)."""
    from fqzcomp5_tpu import fastq

    src = tmp_path / "v.fastq"
    _make_fastq(src, n=2500, var_len=True)
    blk = 48 << 10
    scanned = fastq.scan_blocks(str(src), blk)
    assert scanned is not None and len(scanned) > 5

    parser = fastq.Parser(fastq.open_input(str(src)))
    total_nrec = 0
    for k, (start, end, nrec, seq_bytes) in enumerate(scanned):
        ref = parser.next_batch(blk)
        assert ref is not None, f"parser ended early at block {k}"
        got = fastq.parse_block_range(str(src), start, end)
        assert got.num_records == ref.num_records == nrec
        assert got.seq_buf == ref.seq_buf
        assert len(ref.seq_buf) == seq_bytes
        assert got.name_buf == ref.name_buf
        assert got.qual_buf == ref.qual_buf
        assert np.array_equal(got.lens, ref.lens)
        assert np.array_equal(got.flags, ref.flags)
        assert got.fixed_len == ref.fixed_len
        total_nrec += nrec
    assert parser.next_batch(blk) is None
    assert total_nrec == 2500
    # ranges tile the file exactly
    assert scanned[0][0] == 0
    for a, b in zip(scanned, scanned[1:]):
        assert a[1] == b[0]
    assert scanned[-1][1] >= os.path.getsize(src)


def test_scan_blocks_oversized_record(tmp_path):
    """A record larger than blk_size still forms its own block (the
    reference always accepts the first record)."""
    from fqzcomp5_tpu import fastq

    src = tmp_path / "big.fastq"
    seq = b"ACGT" * 5000
    q = b"I" * len(seq)
    recs = b"".join(b"@r%d\n%s\n+\n%s\n" % (i, seq, q)
                    for i in range(4))
    src.write_bytes(recs)
    scanned = fastq.scan_blocks(str(src), 1000)
    assert scanned is not None and len(scanned) == 4
    parser = fastq.Parser(fastq.open_input(str(src)))
    for start, end, nrec, seq_bytes in scanned:
        ref = parser.next_batch(1000)
        got = fastq.parse_block_range(str(src), start, end)
        assert nrec == 1 and got.seq_buf == ref.seq_buf


def test_scan_blocks_rejects_gzip_and_fasta(tmp_path):
    from fqzcomp5_tpu import fastq

    gz = tmp_path / "in.fastq.gz"
    with gzip.open(gz, "wb") as f:
        f.write(b"@r\nACGT\n+\nIIII\n")
    assert fastq.scan_blocks(str(gz), 1000) is None

    fa = tmp_path / "in.fasta"
    fa.write_bytes(b">r\nACGT\n>s\nGGTT\n")
    assert fastq.scan_blocks(str(fa), 1000) is None


def test_parse_once_work_split(tmp_path):
    """4-process encode: each process parses ~input/N bytes (VERDICT r2
    item 3 'Done' criterion: per-process parse bytes ~ input/N), blocks
    are encoded exactly once in total, and the file matches the
    single-process encoder."""
    src = tmp_path / "in.fastq"
    data = _make_fastq(src, n=6000)

    from fqzcomp5_tpu.drivers import Timings, encode_file
    from fqzcomp5_tpu.options import Options

    arg = Options()
    arg.apply_preset(1)
    arg.blk_size = 32 << 10
    arg.verbose = -1
    arg.nthread = 1
    ref = io.BytesIO()
    encode_file(str(src), ref, arg, Timings())

    out = tmp_path / "dist.fqz5"
    nprocs = 4
    outs = _launch(nprocs, ["-1", "-b", str(32 << 10), str(src),
                            str(out)], {"FQZ5_DIST_STATS": "1"})
    assert out.read_bytes() == ref.getvalue()

    stats = []
    for so, se in outs:
        for ln in so.decode().splitlines():
            if ln.startswith("{"):
                rec = json.loads(ln)
                if "dist_stat" in rec:
                    stats.append(rec)
    assert len(stats) == nprocs
    total = len(data)
    nblocks = sum(s["blocks_encoded"] for s in stats)
    # every block encoded exactly once (no redundant trial encodes)
    from fqzcomp5_tpu import fastq

    scanned = fastq.scan_blocks(str(src), 32 << 10)
    assert nblocks == len(scanned)
    # parse bytes per process ~ input/N (generous x1.6 for round-robin
    # imbalance on trial-heavy prefixes)
    for s in stats:
        assert s["parse_bytes"] <= total / nprocs * 1.6, stats
    assert sum(s["parse_bytes"] for s in stats) <= total + 1024


def test_gzip_falls_back_replicated(tmp_path):
    """Gzip input cannot be pre-scanned: the replicated path must still
    produce byte-identical output with 2 processes."""
    plain = tmp_path / "in.fastq"
    _make_fastq(plain, n=1500)
    gz = tmp_path / "in.fastq.gz"
    with open(plain, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())

    from fqzcomp5_tpu.drivers import Timings, encode_file
    from fqzcomp5_tpu.options import Options

    arg = Options()
    arg.apply_preset(1)
    arg.blk_size = 32 << 10
    arg.verbose = -1
    arg.nthread = 1
    ref = io.BytesIO()
    encode_file(str(gz), ref, arg, Timings())

    out = tmp_path / "dist.fqz5"
    _launch(2, ["-1", "-b", str(32 << 10), str(gz), str(out)])
    assert out.read_bytes() == ref.getvalue()


def test_distributed_decode_seeks_owned_blocks(tmp_path):
    """Index-seek decode: each process reads only its owned blocks'
    bytes (plus header/index), not the whole file."""
    src = tmp_path / "in.fastq"
    data = _make_fastq(src, n=4000)

    from fqzcomp5_tpu.drivers import Timings, encode_file
    from fqzcomp5_tpu.options import Options

    arg = Options()
    arg.apply_preset(1)
    arg.blk_size = 32 << 10
    arg.verbose = -1
    arg.nthread = 1
    comp = tmp_path / "in.fqz5"
    with open(comp, "wb") as f:
        encode_file(str(src), f, arg, Timings())

    out = tmp_path / "out.fastq"
    outs = _launch(4, ["-d", str(comp), str(out)],
                   {"FQZ5_DIST_STATS": "1"})
    assert out.read_bytes() == data
    stats = [json.loads(ln) for so, se in outs
             for ln in so.decode().splitlines()
             if ln.startswith("{") and "dist_stat" in ln]
    csize = os.path.getsize(comp)
    for s in stats:
        assert s["parse_bytes"] <= csize / 4 * 1.6, stats
