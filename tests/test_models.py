"""The Python model spec matches the native engine's coded state."""
import numpy as np

from fqzcomp5_tpu.codecs import host
from fqzcomp5_tpu.models import context_models as cm


def encode_seq_python(seq: bytes, lens, ctx_size: int) -> bytes:
    """Tiny subset of the seq codec (uppercase ACGT only), built from
    the Python models, used to pin the model semantics against C++."""
    msize = 1 << (2 * ctx_size)
    mask = msize - 1
    rc = cm.RangeCoder()
    rc.start_encode()
    seq_models = {}
    run_len = cm.AdaptiveModel(256, 256, step=16)
    L = {65: 0, 67: 1, 71: 2, 84: 3}

    last = 0x007616C7 & mask
    nseq = 0
    seq_len = lens[nseq]
    nseq += 1
    n = len(seq)
    i = 0
    while i < n:
        run = n - i  # all-ACGT input: single run
        r2 = run
        while True:
            run_len.encode(rc, min(255, r2))
            if r2 >= 255:
                r2 -= 255
            else:
                break
        for k in range(run):
            b = L[seq[i + k]]
            m = seq_models.get(last)
            if m is None:
                m = seq_models[last] = cm.TinyModel(4)
            m.encode(rc, b)
            last = ((last << 2) + b) & mask
            seq_len -= 1
            if seq_len == 0 and i + k + 1 < n:
                seq_len = lens[nseq]
                nseq += 1
                last = 0x007616C7 & mask
        i += run
    return rc.finish_encode()


def test_python_spec_matches_native_seq():
    rng = np.random.default_rng(0)
    lens = np.array([40, 40, 40], np.uint32)
    seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 120))
    ours = encode_seq_python(seq, lens, 10)
    native = host.seq_encode(seq, lens, 0, 10)
    assert ours == native


def test_range_coder_roundtrip():
    rc = cm.RangeCoder()
    rc.start_encode()
    m = cm.AdaptiveModel(96, 41)
    rng = np.random.default_rng(1)
    syms = rng.integers(0, 41, 500)
    for s in syms:
        m.encode(rc, int(s))
    data = rc.finish_encode()

    rc2 = cm.RangeCoder()
    rc2.start_decode(data)
    m2 = cm.AdaptiveModel(96, 41)
    got = [m2.decode(rc2) for _ in syms]
    assert got == list(syms)
