"""Distributed x device engine composition (parallel/dist_tpu.py):
multi-process `-e tpu` encode must be byte-identical to the
single-process wave engine, with waves owner-parsed only."""

import io
import json
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


def _make_fastq(path, n=4000, seed=11):
    rng = np.random.default_rng(seed)
    chrom = rng.choice(np.frombuffer(b"ACGT", np.uint8), 30000)
    recs = []
    for i in range(n):
        off = int(rng.integers(0, len(chrom) - 90))
        q = (np.clip(rng.normal(32, 4, 90), 2, 40) + 33).astype(
            np.uint8)
        recs.append(b"@wave%d\n" % i + chrom[off:off + 90].tobytes()
                    + b"\n+\n" + q.tobytes() + b"\n")
    data = b"".join(recs)
    path.write_bytes(data)
    return data


@pytest.mark.parametrize("nprocs", [2, 3])
def test_dist_tpu_matches_single(tmp_path, nprocs):
    src = tmp_path / "in.fastq"
    _make_fastq(src)

    # single-process wave-engine oracle
    from fqzcomp5_tpu.drivers import Timings
    from fqzcomp5_tpu.options import Options
    from fqzcomp5_tpu.tpu_driver import encode_file_tpu

    arg = Options()
    arg.apply_preset(1)
    arg.blk_size = 32 << 10
    arg.verbose = -1
    arg.nthread = 1
    ref = io.BytesIO()
    encode_file_tpu(str(src), ref, arg, Timings())

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
             "-1", "-b", str(32 << 10), "-e", "tpu", str(src),
             str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    assert out.read_bytes() == ref.getvalue(), \
        f"{nprocs}-process tpu-engine output differs from single"

    # parse-once: every block parsed exactly once across the fleet
    stats = [json.loads(ln) for so, se in outs
             for ln in so.decode().splitlines()
             if ln.startswith("{") and "dist_stat" in ln]
    assert len(stats) == nprocs
    total = os.path.getsize(src)
    assert sum(s["parse_bytes"] for s in stats) <= total + 1024

    # and the file decodes back to the input
    from fqzcomp5_tpu.drivers import decode_file, make_fastq_writer
    res = io.BytesIO()
    decode_file(io.BytesIO(out.read_bytes()),
                make_fastq_writer(res, arg), arg, Timings())
    assert res.getvalue() == src.read_bytes()


def test_dist_tpu_trial_review_lockstep(tmp_path):
    """Tiny blocks force many waves and a review re-open (>104 blocks):
    the journal replay must keep learners in lock-step through the
    reopened trial."""
    src = tmp_path / "in.fastq"
    _make_fastq(src, n=9000, seed=12)

    from fqzcomp5_tpu.drivers import Timings
    from fqzcomp5_tpu.options import Options
    from fqzcomp5_tpu.tpu_driver import encode_file_tpu

    arg = Options()
    arg.apply_preset(1)
    arg.blk_size = 8 << 10   # ~140+ blocks -> review reopens mid-file
    arg.verbose = -1
    arg.nthread = 1
    ref = io.BytesIO()
    encode_file_tpu(str(src), ref, arg, Timings())

    port = _free_port()
    out = tmp_path / "dist.fqz5"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "",
            "FQZ5_DIST_COORD": f"127.0.0.1:{port}",
            "FQZ5_DIST_NPROCS": "2",
            "FQZ5_DIST_PID": str(pid),
            "PYTHONPATH": os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "fqzcomp5_tpu.parallel.distributed",
             "-1", "-b", str(8 << 10), "-e", "tpu", str(src),
             str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    assert out.read_bytes() == ref.getvalue()
