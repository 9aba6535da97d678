"""Pallas pass-2 evolution kernel vs the lax.scan formulation: the
(cum, freq, tot) planes must be bit-identical (the scan path is pinned
to the native AdaptiveModel by tests/test_fqz_model_device.py)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from fqzcomp5_tpu.ops import fqz_model_jax, model_pallas  # noqa: E402


def _case(seed, C, T, max_sym, ragged=True):
    rng = np.random.default_rng(seed)
    sym = rng.integers(0, max_sym, (C, T)).astype(np.int32)
    if ragged:
        counts = rng.integers(0, T + 1, C).astype(np.int32)
    else:
        counts = np.full(C, T, np.int32)
    ms = np.full((C, 1), max_sym, np.int32)
    return sym, counts, ms


@pytest.mark.parametrize("seed,C,T,max_sym", [
    (1, 128, 128, 46),
    (2, 256, 256, 96),
    (3, 128, 512, 4),
    (4, 384, 128, 64),
])
def test_pallas_evolve_matches_scan(seed, C, T, max_sym):
    sym, counts, ms = _case(seed, C, T, max_sym)
    want = fqz_model_jax.evolve(jnp.asarray(sym), jnp.asarray(counts),
                                jnp.asarray(ms.reshape(-1)),
                                jnp.int32(16))
    got = model_pallas.evolve_walk(jnp.asarray(sym),
                                   jnp.asarray(counts.reshape(C, 1)),
                                   jnp.asarray(ms), 16,
                                   interpret=True)
    for g, w, name in zip(got, want, ("cum", "freq", "tot")):
        g = np.asarray(g)
        w = np.asarray(w)
        # compare only the active cells (garbage past counts[c])
        for c in range(C):
            n = counts[c]
            assert np.array_equal(g[c, :n], w[c, :n]), (name, c)


def test_pallas_evolve_normalisation_path():
    """Long walks push totals past MAX_FREQ: the halving + re-total
    must stay bit-exact."""
    C, T = 128, 8192
    rng = np.random.default_rng(9)
    # small alphabet so overflow hits fast: tot grows 16/step from 4
    sym = rng.integers(0, 4, (C, T)).astype(np.int32)
    counts = np.full(C, T, np.int32)
    ms = np.full((C, 1), 4, np.int32)
    want = fqz_model_jax.evolve(jnp.asarray(sym), jnp.asarray(counts),
                                jnp.asarray(ms.reshape(-1)),
                                jnp.int32(16))
    got = model_pallas.evolve_walk(jnp.asarray(sym),
                                   jnp.asarray(counts.reshape(C, 1)),
                                   jnp.asarray(ms), 16,
                                   interpret=True)
    for g, w in zip(got, want):
        assert np.array_equal(np.asarray(g), np.asarray(w))
