"""Mesh-sharded wave pipeline: with a Mesh installed via
ops.backend.set_mesh, the batched walks shard their row dims over the
devices and the encoded file must stay byte-identical to the
single-device run (blocks are independent streams — SURVEY.md §5)."""

import io

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # jax/device-heavy: nightly tier (fast tier: pytest -m 'not slow')

from fqzcomp5_tpu.ops import backend


@pytest.fixture
def mesh():
    import jax

    from fqzcomp5_tpu.parallel import pipeline

    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    m = pipeline.make_mesh(devs[:8], dp=4, sp=2)
    backend.set_mesh(m)
    yield m
    backend.set_mesh(None)


def test_encode_flat_sharded_matches(mesh):
    """encode_flat with a non-divisible row count pads with sentinel
    rows and returns bit-identical walks."""
    rng = np.random.default_rng(3)
    B, T = 5, 40  # 5 rows over an 8-device mesh -> padded to 8
    freqs = np.zeros((B, 256), np.uint32)
    freqs[:, :46] = 4096 // 46
    freqs[:, 0] += 4096 - freqs[0].sum()
    flat = rng.integers(0, 46, (B, T, 32)).astype(np.int32)

    got = backend.encode_flat(flat, freqs, 12)
    backend.set_mesh(None)
    want = backend.encode_flat(flat, freqs, 12)
    for g, w in zip(got, want):
        assert np.array_equal(np.asarray(g), np.asarray(w))


def test_wave_file_sharded_matches(mesh, tmp_path):
    """encode_file_tpu under the mesh == without it, byte-for-byte."""
    from fqzcomp5_tpu import tpu_driver
    from fqzcomp5_tpu.drivers import Timings
    from fqzcomp5_tpu.options import Options

    rng = np.random.default_rng(9)
    recs = []
    for i in range(1500):
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), 80)
        q = (np.clip(rng.normal(30, 5, 80), 0, 40) + 33).astype(
            np.uint8)
        recs.append(b"@r%d\n" % i + seq.tobytes() + b"\n+\n"
                    + q.tobytes() + b"\n")
    src = tmp_path / "in.fastq"
    src.write_bytes(b"".join(recs))

    arg = Options()
    arg.apply_preset(1)
    arg.blk_size = 16 << 10
    arg.verbose = -1

    out_m = io.BytesIO()
    tpu_driver.encode_file_tpu(str(src), out_m, arg, Timings())
    backend.set_mesh(None)
    out_1 = io.BytesIO()
    tpu_driver.encode_file_tpu(str(src), out_1, arg, Timings())
    assert out_m.getvalue() == out_1.getvalue()


def test_adaptive_batch_sharded_matches(mesh):
    """The sharded pass-2 evolution and pass-3 walk stay byte-exact."""
    from fqzcomp5_tpu.codecs import host
    from fqzcomp5_tpu.ops.adaptive_batch import encode_adaptive_batch

    rng = np.random.default_rng(13)
    lens = rng.integers(40, 120, 150).astype(np.uint32)
    total = int(lens.sum())
    q = np.clip(np.cumsum(rng.integers(-2, 3, total)) % 40 + 3,
                0, 45).astype(np.uint8)
    seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), total))
    flags = np.zeros(len(lens), np.uint32)
    got = encode_adaptive_batch([
        ("fqz", bytes(q), lens, flags, None, 1),
        ("seq", seq, lens, 1, 12),
    ])
    assert got[0] == host.fqz_compress(bytes(q), lens, flags, None, 1)
    assert got[1] == host.seq_encode(seq, lens, 1, 12)


def test_decode_batch_sharded_matches(mesh):
    """decode_o0_batch under the mesh (scan path, rows sharded over
    dp x sp with degenerate pad streams) must reproduce the data."""
    from fqzcomp5_tpu import engine_tpu

    rng = np.random.default_rng(21)
    datas = [rng.choice(np.frombuffer(b"ACGTN", np.uint8),
                        int(rng.integers(100, 3000))).tobytes()
             for _ in range(5)]   # 5 streams -> padded to 8
    payloads = engine_tpu.encode_o0_batch(datas)
    got = engine_tpu.decode_o0_batch(payloads, [len(d) for d in datas])
    assert got == datas
    payloads1 = engine_tpu.encode_o1_batch(datas)
    got1 = engine_tpu.decode_o1_batch(payloads1,
                                      [len(d) for d in datas])
    assert got1 == datas
    backend.set_mesh(None)
    want = engine_tpu.decode_o0_batch(payloads,
                                      [len(d) for d in datas])
    assert want == datas


def test_decode_file_sharded_matches(mesh, tmp_path):
    """decode_file_tpu under the mesh == without it, byte-for-byte."""
    from fqzcomp5_tpu import tpu_driver
    from fqzcomp5_tpu.drivers import Timings, make_fastq_writer
    from fqzcomp5_tpu.options import Options

    rng = np.random.default_rng(33)
    recs = []
    for i in range(800):
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), 80)
        q = (np.clip(rng.normal(30, 5, 80), 0, 40) + 33).astype(
            np.uint8)
        recs.append(b"@r%d\n" % i + seq.tobytes() + b"\n+\n"
                    + q.tobytes() + b"\n")
    src = tmp_path / "in.fastq"
    data = b"".join(recs)
    src.write_bytes(data)

    arg = Options()
    arg.apply_preset(1)
    arg.blk_size = 16 << 10
    arg.verbose = -1

    comp = io.BytesIO()
    tpu_driver.encode_file_tpu(str(src), comp, arg, Timings())

    res = io.BytesIO()
    comp.seek(0)
    tpu_driver.decode_file_tpu(comp, make_fastq_writer(res, arg),
                               arg, Timings())
    assert res.getvalue() == data
