"""Device-backend selection for the rANS state walks.

On a real TPU the Pallas kernel (ops/rans_pallas.py) runs the encode
walk ~50x faster than the lax.scan formulation; on CPU (tests, virtual
meshes) the scan path is used.  Both produce bit-identical streams.

Set FQZ5_PALLAS=0 to force the scan path, =1 to force Pallas.
"""

from __future__ import annotations

import os

import numpy as np


def _bucket(n: int, lo: int = 64) -> int:
    """Round up to a power of two (>= lo): distinct tensor shapes cost
    a Mosaic compile each, so waves of varying block counts/lengths
    must land on a small set of shapes."""
    b = lo
    while b < n:
        b <<= 1
    return b


_mesh = None


def set_mesh(mesh) -> None:
    """Install a jax.sharding.Mesh for the batched walks: leading
    (row) dims of the device batches shard over ALL mesh axes
    (dp x sp flattened — every row is an independent stream, the
    reference's thread-pool data parallelism).  Stripe sub-streams are
    laid out contiguously per section by the wave driver, so the N
    stripes of one section land on adjacent devices — the sp-axis
    neighbours (SURVEY.md §5 long-context analog).  Pass None to go
    back to single-device placement."""
    global _mesh
    _mesh = mesh


def current_mesh():
    return _mesh


def shard_rows(arr, extra_dims: int = 0):
    """device_put with the leading dim sharded over the mesh (no-op
    without one).  The caller must have padded dim 0 to a multiple of
    mesh.size (see pad_rows)."""
    if _mesh is None:
        return arr
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    spec = PartitionSpec(_mesh.axis_names, *([None] * extra_dims))
    return jax.device_put(arr, NamedSharding(_mesh, spec))


def pad_rows(n: int) -> int:
    """Rows needed so dim 0 divides the mesh (0 without a mesh)."""
    if _mesh is None:
        return 0
    m = _mesh.size
    return (-n) % m


_cache_ready = False


def honor_platform_env() -> None:
    """Make `JAX_PLATFORMS=cpu` actually stick: site plugins (the axon
    TPU tunnel) force-prepend their platform regardless of the env
    var, so a host-only CLI run can silently block on a flapping
    tunnel.  Re-asserting the user's choice through jax.config wins
    over the plugin.  No-op once a backend is initialised or when the
    env var is unset."""
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    try:
        import jax

        jax.config.update("jax_platforms", env)
    except Exception:
        pass  # backends already initialised; too late to re-pin


def ensure_compile_cache() -> None:
    """Persistent XLA compilation cache: kernel compiles survive across
    CLI invocations (a fresh process otherwise pays seconds per
    shape)."""
    global _cache_ready
    if _cache_ready:
        return
    _cache_ready = True
    honor_platform_env()
    try:
        import pathlib

        import jax

        d = pathlib.Path.home() / ".cache" / "fqz5_jax"
        d.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(d))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass


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
    if _use_pallas() and (_mesh is None or _mesh.size == 1):
        # NB: with a multi-device mesh installed the sharded scan path
        # below runs instead — the Pallas kernel is compiled for one
        # device and would silently ignore the mesh.  (A shard_mapped
        # kernel is the eventual fix; single-chip dev hardware can't
        # validate it yet.)
        from fqzcomp5_tpu.ops import rans_pallas

        ensure_compile_cache()
        pt = rans_pallas.build_packed_tables(freqs, shift)
        # pad T to a shape bucket with no-op sentinel steps (appended
        # high: the reversed walk runs them first, leaving states
        # untouched) so wave after wave reuses one compiled kernel
        Tb = _bucket(T)
        if Tb != T:
            S = pt.shape[1] - 1
            padT = np.full((B, Tb - T, n), S, flat.dtype)
            flat = np.concatenate([flat, padT], axis=1)
        P = rans_pallas.pack_plane_host(flat.astype(np.int32), pt, shift)
        # bucket the row count too (identity-padded streams)
        B4 = P.shape[1]
        B4b = _bucket(B4, lo=2)
        if B4b != B4:
            ident = np.full((P.shape[0], B4b - B4, 128),
                            1 << (2 * shift), np.int32)
            P = np.concatenate([P, ident], axis=1)
        if R0 is None:
            R0p = np.full((B4b, 128), rans_pallas.RANS_L, np.int32)
        else:
            R0i = np.asarray(R0, np.int64).astype(np.int32)
            R0p = rans_pallas._pack_rows(
                jnp.asarray(R0i[:, None, :]))[:, 0, :]
            R0p = np.asarray(R0p)
            if R0p.shape[0] < B4b:
                pad = np.full((B4b - R0p.shape[0], 128),
                              rans_pallas.RANS_L, np.int32)
                R0p = np.concatenate([R0p, pad], axis=0)
        from fqzcomp5_tpu.ops import devtimer

        P_d = devtimer.put(P)
        R0_d = devtimer.put(R0p)

        def _walk():
            Rf_d, out_d = rans_pallas.encode_walk(P_d, R0_d, shift=shift)
            # trim the T bucket and unpack rows ON DEVICE: one download
            # instead of the old fetch->re-upload->fetch round trip
            out_u = rans_pallas._unpack_rows(
                jnp.swapaxes(out_d[:T], 0, 1), B)
            Rf_u = rans_pallas._unpack_rows(Rf_d[:, None, :], B)[:, 0, :]
            return Rf_u, out_u

        Rf_u, out_u = devtimer.compute(_walk)
        out = devtimer.get(out_u)
        Rf = devtimer.get(Rf_u)
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

    pad = pad_rows(B)
    if pad:
        # sentinel rows (nop index everywhere) so the row count
        # divides the mesh; their walks emit nothing and are dropped
        S = x_max.shape[1] - 1  # nop table row
        flat = np.concatenate(
            [flat, np.full((pad,) + flat.shape[1:], S, flat.dtype)])
        x_max, rcp, rsh, bias, cmpl = (
            np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
            for a in (x_max, rcp, rsh, bias, cmpl))
        if R0j is not None:
            R0j = np.concatenate(
                [R0j, np.full((pad,) + R0j.shape[1:],
                              rans_jax.RANS_L, R0j.dtype)])
    flat_d = shard_rows(flat.astype(np.int32), extra_dims=2)
    tabs_d = [shard_rows(a, extra_dims=1)
              for a in (x_max, rcp, rsh, bias, cmpl)]
    R0d = None if R0j is None else shard_rows(R0j, extra_dims=1)
    Rf, words, mask = rans_jax.encode_scan_flat(
        flat_d, *tabs_d, R0d)
    return (np.asarray(Rf)[:B], np.asarray(words)[:B].astype(np.uint32),
            np.asarray(mask)[:B].astype(bool))
