"""Device-backend selection for the rANS state walks.

On a real TPU the Pallas kernel (ops/rans_pallas.py) runs the encode
walk ~50x faster than the lax.scan formulation; on CPU (tests, virtual
meshes) the scan path is used.  Both produce bit-identical streams.

Set FQZ5_PALLAS=0 to force the scan path, =1 to force Pallas.
"""

from __future__ import annotations

import os

import numpy as np


def _use_pallas() -> bool:
    env = os.environ.get("FQZ5_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        # backend init can fail transiently (tunnelled TPU); the scan
        # path on CPU always works
        return False


def encode_flat(flat: np.ndarray, freqs: np.ndarray, shift: int,
                R0: np.ndarray | None = None):
    """Run the reversed encode walk over (B, T, 32) flat table indices.

    freqs: (B, S) rows normalised to sum 1<<shift (S=256 for order-0,
    65536 for order-1); index S is the no-op sentinel.  Returns numpy
    (Rf (B,32) uint32, words (B,T,32) uint32, mask (B,T,32) bool)."""
    import jax.numpy as jnp

    B, T, n = flat.shape
    if _use_pallas():
        from fqzcomp5_tpu.ops import rans_pallas

        pt = rans_pallas.build_packed_tables(freqs, shift)
        P = rans_pallas.pack_plane_host(flat.astype(np.int32), pt, shift)
        if R0 is None:
            R0p = np.full((P.shape[1], 128), rans_pallas.RANS_L, np.int32)
        else:
            R0i = np.asarray(R0, np.int64).astype(np.int32)
            R0p = rans_pallas._pack_rows(
                jnp.asarray(R0i[:, None, :]))[:, 0, :]
            R0p = np.asarray(R0p)
            if R0p.shape[0] < P.shape[1]:
                pad = np.full((P.shape[1] - R0p.shape[0], 128),
                              rans_pallas.RANS_L, np.int32)
                R0p = np.concatenate([R0p, pad], axis=0)
        Rf, out = rans_pallas.encode_walk(jnp.asarray(P), jnp.asarray(R0p),
                                          shift=shift)
        out = np.asarray(out)     # (T, B4, 128)
        Rf = np.asarray(Rf)
        out = np.asarray(rans_pallas._unpack_rows(
            jnp.swapaxes(jnp.asarray(out), 0, 1), B))
        Rf = np.asarray(rans_pallas._unpack_rows(
            jnp.asarray(Rf)[:, None, :], B))[:, 0, :]
        words = (out & 0xFFFF).astype(np.uint32)
        mask = (out >> 16) != 0
        return Rf.astype(np.uint32), words, mask

    from fqzcomp5_tpu.ops import rans_jax

    tt = rans_jax.build_enc_tables(freqs, shift)
    app = lambda a, v: np.concatenate(  # noqa: E731
        [a.reshape(B, -1), np.full((B, 1), v, a.dtype)], axis=1)
    x_max = app(tt[0], 0xFFFFFFFF)
    rcp = app(tt[1], 0)
    rsh = app(tt[2], 0)
    bias = app(tt[3], 0)
    cmpl = app(tt[4], 0)
    R0j = None if R0 is None else np.asarray(R0, np.uint32)
    Rf, words, mask = rans_jax.encode_scan_flat(
        flat.astype(np.int32), x_max, rcp, rsh, bias, cmpl, R0j)
    return (np.asarray(Rf), np.asarray(words).astype(np.uint32),
            np.asarray(mask).astype(bool))
