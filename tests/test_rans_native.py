"""Byte-parity of the native rANS Nx16 engine vs the reference."""
import numpy as np
import pytest

from fqzcomp5_tpu.codecs import native
from tests import oracle_util as oracle

pytestmark = pytest.mark.skipif(
    not oracle.have_oracle(), reason="reference oracle not built")

RNG = np.random.default_rng(42)


def gen_corpus():
    cases = {}
    cases["tiny"] = b"abc"
    cases["empty"] = b""
    cases["one"] = b"Q"
    cases["const4k"] = b"A" * 4096
    cases["random1k"] = RNG.integers(0, 256, 1000).astype(np.uint8).tobytes()
    cases["dna"] = RNG.choice(
        np.frombuffer(b"ACGT", np.uint8), 20000,
        p=[0.3, 0.2, 0.2, 0.3]).tobytes()
    q = np.clip(RNG.normal(30, 5, 60000), 0, 60).astype(np.uint8)
    cases["qual"] = q.tobytes()
    cases["qual4"] = RNG.choice(
        np.array([2, 12, 22, 37], np.uint8), 60000).tobytes()
    runs = np.repeat(RNG.integers(0, 5, 300).astype(np.uint8),
                     RNG.integers(1, 50, 300))
    cases["rle"] = runs.tobytes()
    cases["big"] = RNG.integers(0, 16, 120000).astype(np.uint8).tobytes()
    cases["len31"] = bytes(range(31))
    cases["len32"] = bytes(range(32))
    cases["len33"] = bytes(range(33))
    # X32 dispatch boundaries: the O1 SIMD walk's gather overread guard
    # runs 1-2 top columns scalar when in_size % 32 < 2 (rans.cpp),
    # so pin byte-parity at sizes straddling the alignment
    big = RNG.integers(33, 74, 64035).astype(np.uint8)
    for k in (64032, 64033, 64034, 64035):
        cases[f"x32a{k % 32}"] = big[:k].tobytes()
    return cases


CORPUS = gen_corpus()
ORDERS = [0, 1, 4, 5, 64, 65, 128, 129, 192, 193, 0x20]


@pytest.mark.parametrize("order", ORDERS)
@pytest.mark.parametrize("name", list(CORPUS))
def test_encode_matches_reference(order, name):
    data = CORPUS[name]
    ours = native.rans_compress(data, order)
    ref = oracle.rans_enc(data, order)
    assert ours == ref, (
        f"order={order:#x} {name}: {len(ours)} vs ref {len(ref)} bytes")


@pytest.mark.parametrize("order", ORDERS)
@pytest.mark.parametrize("name", list(CORPUS))
def test_decode_of_reference_stream(order, name):
    data = CORPUS[name]
    ref = oracle.rans_enc(data, order)
    assert native.rans_uncompress(ref) == data


@pytest.mark.parametrize("name", list(CORPUS))
def test_stripe(name):
    data = CORPUS[name]
    if len(data) < 8:
        return
    for N in (4, 8):
        order = (N << 8) | 0x08 | 1  # STRIPE | O1, like RANSXN1
        ours = native.rans_compress(data, order)
        ref = oracle.rans_enc(data, order)
        assert ours == ref, f"stripe N={N} {name}"
        assert native.rans_uncompress(ref) == data


def test_reference_decodes_ours():
    for name, data in CORPUS.items():
        if not data:
            continue
        for order in (1, 129, 193, 5):
            ours = native.rans_compress(data, order)
            assert oracle.rans_dec(ours) == data, f"{name} order={order}"
