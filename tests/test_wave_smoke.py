"""Fast-tier smoke coverage of the wave (device) engine.

The full device-engine suites (test_device_engine, test_tpu_driver,
test_adaptive_batch, test_mesh_pipeline, ...) are marked `slow`
(minutes of CPU-interpret kernel time each); this file keeps one small
encode+decode roundtrip and one multi-block learning pass in the fast
tier so `pytest -m "not slow"` still exercises the wave pipeline
end-to-end (VERDICT r4 item 5: the fast tier must cover every code
path a budgeted CI run relies on).
"""
import numpy as np

from fqzcomp5_tpu import cli


def _fastq(tmp_path, n, name="in.fastq"):
    rng = np.random.default_rng(7)
    recs = []
    for i in range(n):
        seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 64)])
        q = (rng.normal(28, 4, 64).clip(0, 40) + 33).astype(
            np.uint8).tobytes().decode("latin1")
        recs.append(f"@S.{i} {i}\n{seq}\n+\n{q}\n")
    p = tmp_path / name
    p.write_text("".join(recs))
    return p


def test_wave_roundtrip_smoke(tmp_path):
    src = _fastq(tmp_path, 400)
    comp = tmp_path / "c.fqz5"
    out = tmp_path / "o.fastq"
    assert cli.main(["-e", "tpu", str(src), str(comp)]) == 0
    assert cli.main(["-e", "tpu", "-d", str(comp), str(out)]) == 0
    assert out.read_bytes() == src.read_bytes()
    # host decode of the wave-encoded file (format compatibility)
    out2 = tmp_path / "o2.fastq"
    assert cli.main(["-d", str(comp), str(out2)]) == 0
    assert out2.read_bytes() == src.read_bytes()


def test_wave_multiblock_learning_smoke(tmp_path):
    # several small blocks so the learner passes trial -> locked within
    # one wave; decode must roundtrip across the lock boundary
    src = _fastq(tmp_path, 1200)
    comp = tmp_path / "c.fqz5"
    out = tmp_path / "o.fastq"
    assert cli.main(["-e", "tpu", "-b", "32K", str(src),
                     str(comp)]) == 0
    assert cli.main(["-d", str(comp), str(out)]) == 0
    assert out.read_bytes() == src.read_bytes()
