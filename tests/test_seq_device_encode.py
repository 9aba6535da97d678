"""End-to-end device SEQ encode (ops/seq_device_encode.py): the
device payload must equal the native seq_encode output byte-for-byte
(native/seq.cpp:39-157), including both-strands shadow updates, case
runs, ambiguity literals and record-boundary context reseeds."""

import numpy as np
import pytest

from fqzcomp5_tpu.codecs import host
from fqzcomp5_tpu.ops import seq_device_encode


def _reads(kind, nrec=200, seed=None):
    rng = np.random.default_rng((seed if seed is not None
                                 else hash(kind)) % 2**31)
    lens = rng.integers(60, 160, nrec).astype(np.uint32)
    total = int(lens.sum())
    # biased base mix so k-mer models adapt hard
    seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), total,
                     p=[0.35, 0.15, 0.15, 0.35]).copy()
    if kind == "case":
        m = rng.random(total) < 0.2
        seq[m] += 32  # lowercase runs
    if kind in ("n", "case"):
        m = rng.random(total) < 0.03
        seq[m] = ord("N")
    if kind == "softclip":
        # long lowercase blocks like aligner soft-clips
        for s in range(0, total - 400, 997):
            seq[s:s + 30] += 32
    return bytes(seq), lens


@pytest.mark.parametrize("both", [0, 1])
@pytest.mark.parametrize("k", [4, 8, 12])
@pytest.mark.parametrize("kind", ["acgt", "case", "n", "softclip"])
def test_seq_device_encode_parity(both, k, kind):
    seq, lens = _reads(kind)
    got = seq_device_encode.encode_payload(seq, lens, both, k)
    want = host.seq_encode(seq, lens, both, k)
    assert got == want, f"{kind} k={k} both={both}"


def test_seq_device_encode_opens_nonupper():
    """Buffer starting with a non-ACGT class hits the zero-length
    initial run + transition path (seq.cpp:82-104)."""
    for head in (b"nnn", b"acgt"):
        seq = head + b"ACGTACGTACGTACGTACGT" * 20
        lens = np.array([len(seq)], np.uint32)
        for both in (0, 1):
            got = seq_device_encode.encode_payload(seq, lens, both, 6)
            want = host.seq_encode(seq, lens, both, 6)
            assert got == want, (head, both)


def test_seq_device_encode_edge_shapes():
    """Length-1 records, a single record, an all-N record mid-batch
    and a 255-multiple run length (the chunked run_len emitter,
    seq.cpp:98-104)."""
    cases = []
    cases.append((b"A" * 64, np.ones(64, np.uint32)))          # len-1
    cases.append((b"ACGT" * 200, np.array([800], np.uint32)))  # single
    mid = b"ACGT" * 30 + b"N" * 120 + b"ACGT" * 30             # all-N rec
    cases.append((mid, np.array([120, 120, 120], np.uint32)))
    r255 = b"A" * 255 + b"n" + b"C" * 510 + b"n" + b"G" * 254
    cases.append((r255, np.array([len(r255)], np.uint32)))
    for seq, lens in cases:
        for both in (0, 1):
            got = seq_device_encode.encode_payload(seq, lens, both, 6)
            want = host.seq_encode(seq, lens, both, 6)
            assert got == want, (lens.tolist()[:3], both)


def test_seq_device_encode_decodes_back():
    seq, lens = _reads("case", seed=3)
    got = seq_device_encode.encode_payload(seq, lens, 1, 10)
    back = host.seq_decode(got, lens, 1, 10, len(seq))
    assert back == seq
