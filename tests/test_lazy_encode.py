"""Lazy candidate walks (engine_tpu._LazyO0/_LazyO1): the trial waves
pick winners from SIZES alone and fetch only the chosen payloads, so
the advertised size of every candidate must equal the materialised
payload's length exactly, and a partial fetch must return the same
bytes as the eager batch (reference semantics: the dispatcher picks by
compressed length, rANS_static4x16pr.c's best-of loop)."""

import numpy as np
import pytest

from fqzcomp5_tpu import engine_tpu


def _streams(order):
    rng = np.random.default_rng(7)
    dna = rng.choice(list(b"ACGT"), 9000, p=[.3, .2, .2, .3])
    qual = rng.integers(33, 43, 11000)
    skew = np.concatenate([np.full(5000, 70), rng.integers(64, 80, 600)])
    tiny = rng.integers(0, 256, 40)
    # the empty stream is an O0-only case: o1_prep rejects len 0 on
    # both the lazy and eager paths (sections below MIN_DEVICE never
    # reach the device engine anyway)
    extra = [np.zeros(0, np.uint8)] if order == 0 else []
    return [np.asarray(s, np.uint8).tobytes()
            for s in [dna, qual, skew, tiny] + extra]


@pytest.mark.parametrize("order", [0, 1])
def test_lazy_sizes_and_fetch_match_eager(order):
    datas = _streams(order)
    if order == 0:
        lz = engine_tpu.encode_o0_batch_lazy(datas)
        eager = engine_tpu.encode_o0_batch(datas)
    else:
        lz = engine_tpu.encode_o1_batch_lazy(datas)
        eager = engine_tpu.encode_o1_batch(datas)
    assert lz.sizes == [len(p) for p in eager]
    # partial fetch (the wave engine's winner set): identical bytes
    want = [i for i in (0, 2, 4) if i < len(datas)]
    got = lz.fetch(want)
    assert set(got) == set(want)
    for i, p in got.items():
        assert p == eager[i]
    # a second fetch of other rows still works (device arrays live)
    got2 = lz.fetch([1, 3])
    assert got2[1] == eager[1] and got2[3] == eager[3]


def test_lazy_fetch_all_matches_eager():
    datas = _streams(0)
    lz = engine_tpu.encode_o0_batch_lazy(datas)
    assert lz.fetch_all() == engine_tpu.encode_o0_batch(datas)


def test_lazy_empty_batch():
    lz0 = engine_tpu.encode_o0_batch_lazy([])
    lz1 = engine_tpu.encode_o1_batch_lazy([])
    assert lz0.sizes == [] and lz1.sizes == []
    assert lz0.fetch([]) == {} and lz1.fetch([]) == {}
