"""Multi-process distributed encode (parallel/distributed.py): two
jax.distributed CPU processes round-robin the blocks, all-gather the
payloads to the writer, and the file must be byte-identical to the
single-process encoder."""

import io
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # jax/device-heavy: nightly tier (fast tier: pytest -m 'not slow')


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_fastq(path, n=3000):
    rng = np.random.default_rng(5)
    chrom = rng.choice(np.frombuffer(b"ACGT", np.uint8), 30000)
    recs = []
    for i in range(n):
        off = int(rng.integers(0, len(chrom) - 90))
        q = (np.clip(rng.normal(32, 4, 90), 2, 40) + 33).astype(
            np.uint8)
        recs.append(b"@blk%d\n" % i + chrom[off:off + 90].tobytes()
                    + b"\n+\n" + q.tobytes() + b"\n")
    data = b"".join(recs)
    path.write_bytes(data)
    return data


@pytest.mark.parametrize("nprocs", [2, 3])
def test_multi_process_encode_matches_single(tmp_path, nprocs):
    src = tmp_path / "in.fastq"
    _make_fastq(src)

    # single-process oracle (host driver, same preset/blocking)
    from fqzcomp5_tpu.drivers import Timings, encode_file
    from fqzcomp5_tpu.options import Options

    arg = Options()
    arg.apply_preset(3)
    arg.blk_size = 64 << 10
    arg.verbose = -1
    arg.nthread = 1
    ref = io.BytesIO()
    encode_file(str(src), ref, arg, Timings())

    port = _free_port()
    out = tmp_path / "dist.fqz5"
    procs = []
    for pid in range(nprocs):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "",
            "FQZ5_DIST_COORD": f"127.0.0.1:{port}",
            "FQZ5_DIST_NPROCS": str(nprocs),
            "FQZ5_DIST_PID": str(pid),
            "FQZ5_DIST_STATS": "1",
            "PYTHONPATH": os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "fqzcomp5_tpu.parallel.distributed",
             "-3", "-b", str(64 << 10), str(src), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    assert out.read_bytes() == ref.getvalue(), \
        f"{nprocs}-process output differs from single-process encoder"

    # parse-once: each process parses only its OWNED byte ranges —
    # ~input/N, never the whole file (reference: one reader feeds the
    # pool, fqzcomp5.c:3050-3077).  Slack of one block covers the
    # round-robin remainder.
    import json

    insize = os.path.getsize(src)
    stats = [json.loads(so.decode().strip().splitlines()[-1])
             for (so, _se) in outs]
    for st in stats:
        assert st["parse_bytes"] <= insize / nprocs + (64 << 10), st
    assert sum(st["parse_bytes"] for st in stats) <= insize + 1

    # and it decodes
    from fqzcomp5_tpu.drivers import decode_file, make_fastq_writer
    res = io.BytesIO()
    decode_file(io.BytesIO(out.read_bytes()),
                make_fastq_writer(res, arg), arg, Timings())
    assert res.getvalue() == src.read_bytes()


def test_multi_process_tpu_engine_local_mesh(tmp_path):
    """Composed deployment shape ("N hosts x local chips"): each
    jax.distributed process runs the wave/device engine over its OWN
    2x2 virtual-device mesh (FQZ5_DIST_LOCAL_MESH) while compressed
    payloads gather across processes.  The file must be byte-identical
    whatever the process count."""
    src = tmp_path / "in.fastq"
    _make_fastq(src, n=1500)

    def run(nprocs, out):
        port = _free_port()
        procs = []
        for pid in range(nprocs):
            env = dict(os.environ)
            env.update({
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
                "FQZ5_DIST_LOCAL_MESH": "2x2",
                "FQZ5_DIST_COORD": f"127.0.0.1:{port}",
                "FQZ5_DIST_NPROCS": str(nprocs),
                "FQZ5_DIST_PID": str(pid),
                "PYTHONPATH": os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))),
            })
            procs.append(subprocess.Popen(
                [sys.executable, "-m",
                 "fqzcomp5_tpu.parallel.distributed",
                 "-3", "-b", str(64 << 10), "-e", "tpu",
                 str(src), str(out)],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE))
        outs = [p.communicate(timeout=600) for p in procs]
        for p, (_so, se) in zip(procs, outs):
            assert p.returncode == 0, se.decode()[-2000:]

    out1 = tmp_path / "mesh1p.fqz5"
    out2 = tmp_path / "mesh2p.fqz5"
    run(1, out1)
    run(2, out2)
    assert out1.read_bytes() == out2.read_bytes(), \
        "composed 2-proc x 2x2-mesh output differs from 1-proc"

    # and the composed file decodes back to the input
    import io

    from fqzcomp5_tpu.drivers import Timings, decode_file, \
        make_fastq_writer
    from fqzcomp5_tpu.options import Options

    arg = Options()
    arg.verbose = -1
    res = io.BytesIO()
    decode_file(io.BytesIO(out2.read_bytes()),
                make_fastq_writer(res, arg), arg, Timings())
    assert res.getvalue() == src.read_bytes()


def test_multi_process_decode_matches_single(tmp_path):
    """Distributed decode: 2 processes round-robin the blocks and the
    gathered output text must equal the input byte-for-byte."""
    nprocs = 2
    src = tmp_path / "in.fastq"
    data = _make_fastq(src)

    from fqzcomp5_tpu.drivers import Timings, encode_file
    from fqzcomp5_tpu.options import Options

    arg = Options()
    arg.apply_preset(3)
    arg.blk_size = 64 << 10
    arg.verbose = -1
    arg.nthread = 1
    comp = tmp_path / "in.fqz5"
    with open(comp, "wb") as f:
        encode_file(str(src), f, arg, Timings())

    port = _free_port()
    out = tmp_path / "dist.fastq"
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
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "fqzcomp5_tpu.parallel.distributed",
             "-d", str(comp), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    assert out.read_bytes() == data


def test_multi_process_decode_paired(tmp_path):
    """Paired (deinterleaved) distributed decode: the two formatted
    halves travel length-prefixed through the gather."""
    nprocs = 2
    r1 = tmp_path / "r1.fastq"
    r2 = tmp_path / "r2.fastq"
    rng = np.random.default_rng(8)
    chrom = rng.choice(np.frombuffer(b"ACGT", np.uint8), 30000)
    recs1, recs2 = [], []
    for i in range(2000):
        for recs, tag in ((recs1, b"/1"), (recs2, b"/2")):
            off = int(rng.integers(0, len(chrom) - 90))
            q = (np.clip(rng.normal(32, 4, 90), 2, 40) + 33).astype(
                np.uint8)
            recs.append(b"@pair%d%s\n" % (i, tag)
                        + chrom[off:off + 90].tobytes()
                        + b"\n+\n" + q.tobytes() + b"\n")
    r1.write_bytes(b"".join(recs1))
    r2.write_bytes(b"".join(recs2))

    from fqzcomp5_tpu.drivers import Timings, encode_paired
    from fqzcomp5_tpu.options import Options

    arg = Options()
    arg.apply_preset(3)
    arg.blk_size = 64 << 10
    arg.verbose = -1
    arg.nthread = 1
    comp = tmp_path / "p.fqz5"
    with open(comp, "wb") as f:
        encode_paired(str(r1), str(r2), f, arg, Timings())

    port = _free_port()
    o1 = tmp_path / "o1.fastq"
    o2 = tmp_path / "o2.fastq"
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
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "fqzcomp5_tpu.parallel.distributed",
             "-d", str(comp), str(o1), str(o2)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    assert o1.read_bytes() == r1.read_bytes()
    assert o2.read_bytes() == r2.read_bytes()
