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
        from fqzcomp5_tpu.ops import devtimer

        # timed upload under FQZ5_DEVTIME so pass-2 planes count in
        # the link split; plain passthrough otherwise
        return devtimer.put(arr) if devtimer.enabled else arr
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


# ---------------------------------------------------------------------
# Deferred device dispatch (round 5, VERDICT item 2): the wave engine
# queues every walk/gather of a wave segment and flushes them in ONE
# synced device call.  Through the ~40ms/RTT dev tunnel the per-call
# fixed cost dominated device-compute seconds (BENCH_r04: 15-25 MB/s
# device-resident vs 37 GB/s raw walks); fusing N dispatches into one
# block_until_ready turns N round trips into one.  Each deferred fn
# returns (out_tree, small_dl | None): small_dl values (e.g. per-stream
# nword counts) are concatenated ON DEVICE and downloaded in a single
# transfer at flush time.

class Deferred:
    __slots__ = ("fn", "out", "small")

    def __init__(self, fn):
        self.fn = fn
        self.out = None      # device output tree after flush
        self.small = None    # numpy small-download slice after flush


_dq: list[Deferred] = []
_defer_depth = 0


class deferred_walks:
    """Context manager: inside it, walk dispatches queue instead of
    executing.  The queue flushes at the first result access (nwords /
    fetch / out), NOT at context exit — so a caller can create many
    lazy encoders in the context and read sizes after."""

    def __enter__(self):
        global _defer_depth
        _defer_depth += 1
        return self

    def __exit__(self, *exc):
        global _defer_depth
        _defer_depth -= 1
        return False


def defer_active() -> bool:
    return _defer_depth > 0


def defer(fn) -> Deferred:
    d = Deferred(fn)
    _dq.append(d)
    return d


def flush_deferred() -> None:
    """Dispatch every queued fn and block ONCE; download all declared
    small results in ONE transfer."""
    global _dq
    if not _dq:
        return
    import jax.numpy as jnp

    from fqzcomp5_tpu.ops import devtimer

    qs, _dq = _dq, []

    def _all():
        smalls = []
        for q in qs:
            o, s = q.fn()
            q.out = o   # visible immediately: a later fn in this
            # batch may _resolve an earlier entry
            if s is not None and (s.ndim != 1
                                  or s.dtype != jnp.int32):
                s = s.reshape(-1).astype(jnp.int32)
            smalls.append(s)
        cat = (jnp.concatenate([s for s in smalls if s is not None])
               if any(s is not None for s in smalls) else None)
        # outs ride in the return tree so devtimer.compute's single
        # block_until_ready covers every dispatched walk/gather
        return smalls, cat, [q.out for q in qs]

    smalls, cat_d, _outs = devtimer.compute(_all)
    cat = devtimer.get(cat_d) if cat_d is not None else None
    off = 0
    for q, s in zip(qs, smalls):
        if s is not None:
            n = int(s.shape[0])
            q.small = cat[off:off + n]
            off += n


def _resolve(d):
    """Deferred -> its device outputs (flushing if still queued)."""
    if d.out is None:
        flush_deferred()
    if d.out is None:
        # a prior flush died mid-batch (tunnel drop): surface it so
        # the wave driver's host fallback takes over
        raise RuntimeError("deferred device walk was lost to a failed "
                           "flush")
    return d.out


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
        # must run BEFORE jax.default_backend() initialises backends:
        # the axon site plugin force-prepends its TPU platform, and
        # this is often the process's first jax touch (a CLI
        # JAX_PLATFORMS=cpu run would otherwise grab the tunnel here
        # and be stuck with it)
        honor_platform_env()
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        # backend init can fail transiently (tunnelled TPU); the scan
        # path on CPU always works
        return False


def _dev_encode_jit():
    """Build (once) the jitted device-side plane-build + walk + compact
    result path.  The table lookup runs as a one-hot int8 matmul on the
    MXU: XLA's native gather on TPU is scalar-bound (~0.08 Gelem/s
    measured on v5e vs ~1 Gelem/s for the one-hot form), and a one-hot
    row makes each output a single exact int8*int8->int32 product, so
    the packed table entries reconstruct bit-exactly from byte planes.
    Uploading u8 symbol indices + byte-plane tables and downloading u16
    words + bit-packed masks cuts host<->device traffic ~10x vs moving
    int32 planes both ways; all shape-bucket padding (T -> Tb, B -> Bp)
    happens ON DEVICE so the link carries only real data."""
    global _DEV_ENCODE
    if _DEV_ENCODE is not None:
        return _DEV_ENCODE
    import functools

    import jax
    import jax.numpy as jnp

    from fqzcomp5_tpu.ops import rans_pallas

    @functools.partial(jax.jit, static_argnames=(
        "shift", "S", "T", "Tb", "B4b", "interpret"))
    def _run(small, nopb, ptb, R0p, *, shift, S, T, Tb, B4b,
             interpret):
        B, _, n = small.shape
        Bp = B4b * 4
        idx = small.astype(jnp.int32)
        bits = (nopb[..., None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
        nop = bits.reshape(B, T, n) != 0
        idx = jnp.where(nop, S, idx)
        if Tb != T:
            idx = jnp.concatenate(
                [idx, jnp.full((B, Tb - T, n), S, jnp.int32)], 1)
        if Bp != B:
            idx = jnp.concatenate(
                [idx, jnp.full((Bp - B, Tb, n), S, jnp.int32)], 0)
            ptb = jnp.concatenate(
                [ptb, jnp.broadcast_to(_nop_bytes_i8(shift),
                                       (Bp - B, S + 1, 4))], 0)
        ii = idx.reshape(Bp, Tb * n)
        oh = (ii[:, :, None] == jnp.arange(S + 1, dtype=jnp.int32)
              ).astype(jnp.int8)
        acc = jax.lax.dot_general(
            oh, ptb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)      # (Bp, Tb*n, 4)
        P = ((acc[..., 0] & 0xFF)
             | ((acc[..., 1] & 0xFF) << 8)
             | ((acc[..., 2] & 0xFF) << 16)
             | ((acc[..., 3] & 0xFF) << 24)).reshape(Bp, Tb, n)
        PB = jnp.swapaxes(rans_pallas._pack_rows(P), 0, 1)
        Rf, out = rans_pallas.encode_walk(PB, R0p, shift=shift,
                                          interpret=interpret)
        return _walk_outputs(Rf, out, B, T, rans_pallas)

    _DEV_ENCODE = _run
    return _run


def _walk_outputs(Rf, out, B, T, rans_pallas):
    """Walk-jit epilogue: per-stream final states, the PACKED word
    plane in its NATIVE (T, B4, 128) orientation, and per-stream
    emitted-word counts.  Round 5: the old epilogue unpacked rows to
    (B, T, 32) u16 + bitmask, whose transposed layout made every
    downstream winner-gather pay a ~210ms u16 relayout on v5e; keeping
    the packed plane native moves that cost to a per-stream (T, 32)
    slice in the gather, which is layout-aligned and <1ms."""
    import jax.numpy as jnp

    Rf_u = rans_pallas._unpack_rows(Rf[:, None, :], B)[:, 0, :]
    mb = (out[:T] >> 16) != 0                  # (T, B4, 128)
    Tn, B4, _ = mb.shape
    nw = (mb.reshape(Tn, B4, 4, 32).sum((0, 3), dtype=jnp.int32)
          .reshape(-1))[:B]
    return Rf_u, out, nw


_DEV_ENCODE = None


def _nop_bytes_i8(shift: int):
    """The no-op table entry 1<<(2*shift) as 4 int8 byte-plane values
    (same bit patterns as numpy's uint8.view(int8))."""
    import jax.numpy as jnp

    v = 1 << (2 * shift)
    bs = [((v >> (8 * k)) & 0xFF) for k in range(4)]
    return jnp.array([b if b < 128 else b - 256 for b in bs],
                     jnp.int8)


def _dev_encode16_jit():
    """Dict-remapped variant for order-1 tables: indices are u16 into a
    compact per-stream dictionary (the distinct (ctx,sym) pairs that
    actually occur — ~17 for DNA, ~2k for qualities — instead of the
    dense 65537-entry table), so the one-hot matmul width stays small.
    The sentinel is an ordinary dictionary entry (always included), so
    no nop mask is needed; per-stream sentinel slots arrive as `sent`
    for the device-side T padding."""
    global _DEV_ENCODE16
    if _DEV_ENCODE16 is not None:
        return _DEV_ENCODE16
    import functools

    import jax
    import jax.numpy as jnp

    from fqzcomp5_tpu.ops import rans_pallas

    @functools.partial(jax.jit, static_argnames=(
        "shift", "T", "Tb", "B4b", "interpret"))
    def _run(small, sent, ptb, R0p, *, shift, T, Tb, B4b, interpret):
        B, _, n = small.shape
        U = ptb.shape[1]
        Bp = B4b * 4
        idx = small.astype(jnp.int32) & 0xFFFF
        if Tb != T:
            idx = jnp.concatenate(
                [idx, jnp.broadcast_to(sent[:, None, None],
                                       (B, Tb - T, n))], 1)
        if Bp != B:
            # pad streams: index 0 into all-nop pad table rows
            idx = jnp.concatenate(
                [idx, jnp.zeros((Bp - B, Tb, n), jnp.int32)], 0)
            ptb = jnp.concatenate(
                [ptb, jnp.broadcast_to(_nop_bytes_i8(shift),
                                       (Bp - B, U, 4))], 0)
        ii = idx.reshape(Bp, Tb * n)
        oh = (ii[:, :, None] == jnp.arange(U, dtype=jnp.int32)
              ).astype(jnp.int8)
        acc = jax.lax.dot_general(
            oh, ptb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        P = ((acc[..., 0] & 0xFF)
             | ((acc[..., 1] & 0xFF) << 8)
             | ((acc[..., 2] & 0xFF) << 16)
             | ((acc[..., 3] & 0xFF) << 24)).reshape(Bp, Tb, n)
        PB = jnp.swapaxes(rans_pallas._pack_rows(P), 0, 1)
        Rf, out = rans_pallas.encode_walk(PB, R0p, shift=shift,
                                          interpret=interpret)
        return _walk_outputs(Rf, out, B, T, rans_pallas)

    _DEV_ENCODE16 = _run
    return _run


_DEV_ENCODE16 = None
_DICT_MAX = 4096   # above this the one-hot traffic beats the plane


def _pack_R0(R0, B, B4b, rans_pallas):
    if R0 is None:
        return np.full((B4b, 128), rans_pallas.RANS_L, np.int32)
    full = np.full((B4b * 4, 32), rans_pallas.RANS_L, np.uint32)
    full[:B] = np.asarray(R0, np.uint32)
    # _pack_rows layout: stream b -> row b//4, lanes
    # (b%4)*32:(b%4+1)*32 — a plain reshape
    return full.reshape(B4b, 128).astype(np.int32)


def _fetch_results(Rf_d, packed_d, T, B):
    """Download a walk's packed plane and unpack (host-side) to the
    (B, T, 32) words/mask pair (the eager fetch_all contract)."""
    from fqzcomp5_tpu.ops import devtimer

    Rf = devtimer.get(Rf_d)
    o = devtimer.get(packed_d)[:T]          # (T, B4, 128) int32
    B4 = o.shape[1]
    ob = (o.reshape(T, B4, 4, 32).transpose(1, 2, 0, 3)
          .reshape(B4 * 4, T, 32))[:B]
    return (Rf.astype(np.uint32), (ob & 0xFFFF).astype(np.uint32),
            (ob >> 16) != 0)


def _gather_rows(arr_d, sel: np.ndarray) -> np.ndarray:
    """Device-side row gather + download for a host index list.  The
    gather width buckets to a power of two (repeating the last index)
    so wave after wave of winner-fetches reuses a handful of compiled
    gathers instead of one per distinct winner count."""
    import jax.numpy as jnp

    from fqzcomp5_tpu.ops import devtimer

    pad = _bucket(len(sel), lo=1) - len(sel)
    selp = np.concatenate([sel, np.full(pad, sel[-1], sel.dtype)]
                          ) if pad else sel
    out = devtimer.get(jnp.take(arr_d, jnp.asarray(selp), axis=0))
    return out[:len(sel)]


def _gather_compact_jit():
    global _GATHER_COMPACT
    if _GATHER_COMPACT is not None:
        return _GATHER_COMPACT
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("outcap", "T"))
    def _run(packed, sel, Rf, *, outcap: int, T: int):
        """Gather winner streams from the walk's NATIVE packed plane
        (T, B4, 128) AND squeeze out the no-op word slots ON DEVICE:
        the download is ~2 bytes per EMITTED word (the compressed
        payload).  Slicing per stream keeps the access layout-aligned
        (the old (B, T, 32) u16 form paid a ~210ms relayout per call
        on v5e)."""
        def slice_one(b):
            g = b // 4
            l = (b % 4) * 32
            s = jax.lax.dynamic_slice(
                packed, (0, g, l), (T, 1, 32))   # (T, 1, 32)
            return s.reshape(T * 32)             # t-major, lane-minor

        wf = jax.vmap(slice_one)(sel)            # (K, E) int32
        r = jnp.take(Rf, sel, axis=0)
        mask = (wf >> 16) != 0
        # stable partition by the emit bit: emitted words to the
        # front, walk order preserved.  lax.sort is ~4.5x faster than
        # the searchsorted+take formulation on v5e (46ms vs 205ms for
        # 8x1M slots) — dynamic gathers are the enemy, sorts are not.
        _, out = jax.lax.sort_key_val(
            (~mask).astype(jnp.int32), wf & 0xFFFF, dimension=1,
            is_stable=True)
        nw = mask.sum(1, dtype=jnp.int32)
        E = out.shape[1]
        out = (out[:, :outcap] if outcap <= E else
               jnp.pad(out, ((0, 0), (0, outcap - E))))
        j = jnp.arange(outcap, dtype=jnp.int32)
        out = jnp.where(j[None, :] < nw[:, None], out, 0)
        return out.astype(jnp.uint16), r

    _GATHER_COMPACT = _run
    return _run


_GATHER_COMPACT = None


class LazyFlat:
    """Deferred encode-walk results.

    The trial waves need every candidate's COMPRESSED SIZE to pick a
    winner, but only the winner's bytes.  Downloading all candidates
    costs ~2.25 link bytes per input byte per candidate (words padded
    to the wave Tmax, plus masks); downloading sizes costs 4 bytes per
    stream.  A LazyFlat keeps the walk results device-resident:
    nwords() downloads one int32 per stream, fetch(idxs) gathers only
    the chosen rows.  Results from host/numpy backends are held as-is
    (fetch is free).  parts: (rows, "dev", (Rf_d, w16_d, mpk_d)) or
    (rows, "np", (Rf, words, mask))."""

    def __init__(self, B: int, T: int, n: int):
        self.B, self.T, self.n = B, T, n
        self.parts: list[tuple[np.ndarray, str, tuple]] = []
        self._nw: np.ndarray | None = None
        self._pf: dict = {}   # (part_idx, idx_key) -> Deferred gather

    def _add_np(self, rows, Rf, words, mask) -> None:
        self.parts.append((np.asarray(rows, np.int64), "np",
                           (Rf, words, mask)))

    def _add_dev(self, rows, deferred) -> None:
        """deferred: a backend.Deferred whose out is (Rf_d, w16_d,
        mpk_d) and whose small download is the per-stream nwords."""
        self.parts.append((np.asarray(rows, np.int64), "dev",
                           deferred))

    def nwords(self) -> np.ndarray:
        """(B,) emitted-word count per stream (defines payload size:
        tables + 128 state bytes + 2*nwords).  Device parts got their
        counts in the flush's single fused download."""
        if self._nw is not None:
            return self._nw
        nw = np.zeros(self.B, np.int64)
        for rows, kind, pay in self.parts:
            if kind == "np":
                mask = pay[2]
                nw[rows] = mask.reshape(len(rows), -1).sum(1)
            else:
                if pay.small is None:
                    flush_deferred()
                if pay.small is None:
                    # the flush carrying this walk died (tunnel drop):
                    # surface as the host-fallback trigger
                    raise RuntimeError(
                        "deferred walk lost to a failed flush")
                nw[rows] = pay.small.astype(np.int64)
        self._nw = nw
        return nw

    def _gather_deferred(self, pidx, pay, pos, want, nw_all):
        """Queue the winner gather for one device part; returns the
        Deferred (cached per (part, index-set) so prefetch + fetch
        share one dispatch)."""
        import jax.numpy as jnp

        key = (pidx, tuple(int(i) for i in want))
        if key in self._pf:
            return self._pf[key]
        sel = np.array([pos[int(i)] for i in want], np.int32)
        pad = _bucket(len(sel), lo=1) - len(sel)
        selp = np.concatenate(
            [sel, np.full(pad, sel[-1], sel.dtype)]) if pad else sel
        nws = [int(nw_all[int(i)]) for i in want]
        outcap = _bucket(max(max(nws), 1))
        sel_d = jnp.asarray(selp)
        T = self.T

        def _fn():
            Rf_d, packed_d = _resolve(pay)
            cw_d, Rf_d2 = _gather_compact_jit()(
                packed_d, sel_d, Rf_d, outcap=outcap, T=T)
            return (cw_d, Rf_d2), None

        d = defer(_fn)
        self._pf[key] = d
        return d

    def prefetch(self, idxs) -> None:
        """Queue the gathers for fetch(idxs) WITHOUT flushing: call it
        on several LazyFlats under backend.deferred_walks() and all
        their winner gathers run in one fused device call at the first
        fetch."""
        nw_all = self.nwords()
        for pidx, (rows, kind, pay) in enumerate(self.parts):
            if kind != "dev":
                continue
            pos = {int(r): j for j, r in enumerate(rows)}
            want = [i for i in idxs if int(i) in pos]
            if want:
                self._gather_deferred(pidx, pay, pos, want, nw_all)

    def fetch(self, idxs) -> dict[int, tuple]:
        """idx -> (Rf (32,) u32, words (nwords,) COMPACT) for the
        requested streams only.  Device parts squeeze the no-op slots
        out on device (one jitted gather+compact per part), so the
        link carries ~the compressed payload, not padded planes."""
        from fqzcomp5_tpu.ops import devtimer

        out: dict[int, tuple] = {}
        nw_all = self.nwords()
        for pidx, (rows, kind, pay) in enumerate(self.parts):
            pos = {int(r): j for j, r in enumerate(rows)}
            want = [i for i in idxs if int(i) in pos]
            if not want:
                continue
            if kind == "np":
                Rf, words, mask = pay
                for i in want:
                    j = pos[int(i)]
                    cw = words[j].reshape(-1)[mask[j].reshape(-1)]
                    out[i] = (np.asarray(Rf[j], np.uint32),
                              np.asarray(cw, np.uint32))
            else:
                d = self._gather_deferred(pidx, pay, pos, want,
                                          nw_all)
                cw_d, Rf_d2 = _resolve(d)
                nws = [int(nw_all[int(i)]) for i in want]
                cw = devtimer.get(cw_d[:len(want)])
                Rf = devtimer.get(Rf_d2[:len(want)])
                for j, i in enumerate(want):
                    out[i] = (Rf[j].astype(np.uint32),
                              cw[j, :nws[j]].astype(np.uint32))
        return out

    def fetch_all(self):
        """Materialise every stream (the eager encode_flat contract)."""
        Rf = np.empty((self.B, self.n), np.uint32)
        words = np.empty((self.B, self.T, self.n), np.uint32)
        mask = np.empty((self.B, self.T, self.n), bool)
        for rows, kind, pay in self.parts:
            if kind == "np":
                r0, w0, m0 = pay
            else:
                r0, w0, m0 = _fetch_results(*_resolve(pay), self.T,
                                            len(rows))
            Rf[rows] = r0
            words[rows] = w0.astype(np.uint32)
            mask[rows] = m0
        return Rf, words, mask


def _encode_flat_dev8(flat, freqs, shift, R0, B, T, n):
    """Order-0 device-plane path from an int32 index plane."""
    S = int(np.prod(freqs.shape[1:]))
    small = flat.astype(np.uint8)   # sentinel wraps; nop bit marks it
    nopb = np.packbits(flat == S, axis=-1, bitorder="little")
    return _encode_flat_dev8_pre(small, nopb, freqs, shift, R0, B, T,
                                 n)


def _encode_flat_dev8_pre(small, nopb, freqs, shift, R0, B, T, n):
    """Order-0 device-plane path: u8 indices + nop bitmask up, compact
    words down.  Callers that know stream lengths build (small, nopb)
    directly (encode_u8_lazy) — the int32 sentinel plane np.full cost
    ~2.8s per 24MB wave (round-5 profile)."""
    from fqzcomp5_tpu.ops import devtimer, rans_pallas

    ensure_compile_cache()
    S = int(np.prod(freqs.shape[1:]))
    pt = rans_pallas.build_packed_tables(freqs, shift)  # (B, S+1)
    Tb = _bucket(T)
    B4b = _bucket((B + 3) // 4, lo=2)
    x = pt.astype(np.uint32)
    ptb = np.stack([(x >> (8 * k)) & 0xFF for k in range(4)],
                   axis=-1).astype(np.uint8)
    R0p = _pack_R0(R0, B, B4b, rans_pallas)
    dev = _dev_encode_jit()
    small_d = devtimer.put(small)
    nopb_d = devtimer.put(nopb)
    ptb_d = devtimer.put(ptb.view(np.int8))
    R0_d = devtimer.put(R0p)

    def _fn():
        Rf_d, packed_d, nw_d = dev(
            small_d, nopb_d, ptb_d, R0_d, shift=shift, S=S, T=T,
            Tb=Tb, B4b=B4b, interpret=False)
        return (Rf_d, packed_d), nw_d

    d = defer(_fn)
    if not defer_active():
        flush_deferred()
    return d


def _dict_counts(flat, S, B):
    """Per-stream count of distinct table indices (incl. sentinel)."""
    flags = np.zeros((B, S + 1), bool)
    flags[:, S] = True   # sentinel always in the dict (T-pad uses it)
    for b in range(B):
        flags[b][flat[b].reshape(-1)] = True
    return flags, flags.sum(1)


def _encode_flat_dev16(flat, pt, shift, R0, B, T, n, flags):
    """Dict-remap device path for wide (order-1) tables."""
    from fqzcomp5_tpu.ops import devtimer, rans_pallas

    S = pt.shape[1] - 1
    counts = flags.sum(1)
    Ub = _bucket(int(counts.max()), lo=64)
    Tb = _bucket(T)
    B4b = _bucket((B + 3) // 4, lo=2)
    nop_entry = np.uint32(1 << (2 * shift))
    small = np.zeros((B, T, n), np.uint16)
    sent = np.zeros(B, np.int32)
    ptb = np.empty((B, Ub, 4), np.uint8)
    nop_b = np.array([(int(nop_entry) >> (8 * k)) & 0xFF
                      for k in range(4)], np.uint8)
    ptb[:] = nop_b   # pad entries gather the nop
    for b in range(B):
        uniq = np.flatnonzero(flags[b])
        lut = np.zeros(S + 1, np.uint16)
        lut[uniq] = np.arange(len(uniq), dtype=np.uint16)
        small[b] = lut[flat[b]]
        sent[b] = lut[S]
        ent = pt[b][uniq].astype(np.uint32)
        for k in range(4):
            ptb[b, :len(uniq), k] = (ent >> (8 * k)) & 0xFF
    R0p = _pack_R0(R0, B, B4b, rans_pallas)
    dev = _dev_encode16_jit()
    small_d = devtimer.put(small.view(np.int16))
    sent_d = devtimer.put(sent)
    ptb_d = devtimer.put(ptb.view(np.int8))
    R0_d = devtimer.put(R0p)

    def _fn():
        Rf_d, packed_d, nw_d = dev(
            small_d, sent_d, ptb_d, R0_d, shift=shift, T=T, Tb=Tb,
            B4b=B4b, interpret=False)
        return (Rf_d, packed_d), nw_d

    d = defer(_fn)
    if not defer_active():
        flush_deferred()
    return d


def _dev_plane() -> bool:
    env = os.environ.get("FQZ5_DEV_PLANE")
    if env is not None:
        return env not in ("0", "false", "")
    return True


def _encode_flat_hostplane(flat, pt, shift, R0, B, T, n):
    """Host-built int32 plane path (the pre-round-3 device feed): used
    for wide-table streams whose dict alphabet exceeds _DICT_MAX (e.g.
    order-1 over PACK'd byte streams) and as the FQZ5_DEV_PLANE=0
    escape hatch.  Moves 4B per symbol slot each way."""
    import jax.numpy as jnp

    from fqzcomp5_tpu.ops import devtimer, rans_pallas

    ensure_compile_cache()
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
        R0p = _pack_R0(R0, B, B4b, rans_pallas)
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


def encode_flat(flat: np.ndarray, freqs: np.ndarray, shift: int,
                R0: np.ndarray | None = None):
    """Run the reversed encode walk over (B, T, 32) flat table indices.

    freqs: (B, S) rows normalised to sum 1<<shift (S=256 for order-0,
    65536 for order-1); index S is the no-op sentinel.  Returns numpy
    (Rf (B,32) uint32, words (B,T,32) uint32, mask (B,T,32) bool)."""
    return encode_flat_lazy(flat, freqs, shift, R0).fetch_all()


def encode_u8_lazy(small: np.ndarray, nopb: np.ndarray,
                   freqs: np.ndarray, shift: int,
                   R0: np.ndarray | None = None) -> LazyFlat:
    """encode_flat_lazy for order-0 streams whose (u8 symbols, packed
    nop bitmask) planes are pre-built by the caller: the Pallas path
    uploads them as-is (pad slots' CONTENT is never read — the nop
    bits mask them — so callers may leave pad data uninitialised);
    other backends reconstruct the int32 sentinel plane."""
    B, T, n = small.shape
    if (_use_pallas() and (_mesh is None or _mesh.size == 1)
            and _dev_plane()):
        lz = LazyFlat(B, T, n)
        lz._add_dev(np.arange(B), _encode_flat_dev8_pre(
            small, nopb, freqs, shift, R0, B, T, n))
        return lz
    S = int(np.prod(freqs.shape[1:]))
    flat = small.astype(np.int32)
    mask = np.unpackbits(nopb, axis=-1,
                         bitorder="little").astype(bool)[:, :, :n]
    flat[mask] = S
    return encode_flat_lazy(flat, freqs, shift, R0)


def encode_flat_lazy(flat: np.ndarray, freqs: np.ndarray, shift: int,
                     R0: np.ndarray | None = None) -> LazyFlat:
    """encode_flat, but results stay device-resident behind a LazyFlat
    so trial waves can read candidate sizes without downloading loser
    payloads (see LazyFlat)."""
    B, T, n = flat.shape
    lz = LazyFlat(B, T, n)
    allr = np.arange(B)
    S_total = int(np.prod(freqs.shape[1:]))  # o1 passes (B, 256, 256)
    if (_use_pallas() and (_mesh is None or _mesh.size == 1)
            and _dev_plane()):
        if S_total <= 256:
            lz._add_dev(allr, _encode_flat_dev8(
                flat, freqs, shift, R0, B, T, n))
            return lz
        # wide (order-1) tables: dict-remap the streams whose distinct
        # (ctx,sym) alphabets are small; high-entropy leftovers (e.g.
        # PACK'd byte streams) take the host-plane path
        from fqzcomp5_tpu.ops import rans_pallas

        ensure_compile_cache()
        pt = rans_pallas.build_packed_tables(freqs, shift)
        flags, counts = _dict_counts(flat, S_total, B)
        ok = counts <= _DICT_MAX
        if ok.all():
            lz._add_dev(allr, _encode_flat_dev16(
                flat, pt, shift, R0, B, T, n, flags))
            return lz
        if ok.any():
            oki = np.flatnonzero(ok)
            noi = np.flatnonzero(~ok)
            lz._add_dev(oki, _encode_flat_dev16(
                flat[oki], pt[oki], shift,
                None if R0 is None else R0[oki], len(oki), T, n,
                flags[oki]))
            lz._add_np(noi, *_encode_flat_hostplane(
                flat[noi], pt[noi], shift,
                None if R0 is None else R0[noi], len(noi), T, n))
            return lz
        lz._add_np(allr, *_encode_flat_hostplane(
            flat, pt, shift, R0, B, T, n))
        return lz
    if _use_pallas() and (_mesh is None or _mesh.size == 1):
        from fqzcomp5_tpu.ops import rans_pallas

        ensure_compile_cache()
        pt = rans_pallas.build_packed_tables(freqs, shift)
        lz._add_np(allr, *_encode_flat_hostplane(
            flat, pt, shift, R0, B, T, n))
        return lz

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
    lz._add_np(allr, np.asarray(Rf)[:B],
               np.asarray(words)[:B].astype(np.uint32),
               np.asarray(mask)[:B].astype(bool))
    return lz
