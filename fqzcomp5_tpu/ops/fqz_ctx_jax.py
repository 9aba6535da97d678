"""Pass 1 of the fqz-qual device decomposition: per-byte contexts.

The fqz quality model's context arithmetic (fqz_update_ctx,
fqzcomp_qual.c:361-418; native/fqzqual.cpp update_ctx) is pure integer
work on per-record state, so it vectorises across records: a scan over
the read position updates (qctx, delta, prevq) for R records at once
and emits each byte's 16-bit model context.  Pass 2 (per-context model
evolution) and pass 3 (the batched range-coder walk, ops/rc_jax.py)
consume these planes; see docs/DEVICE_ADAPTIVE_CODECS.md.

Tables arrive from the native parameter picker via
fqz5_fqz_dump_ctx's serialization (the picker is stats-heavy host
work by design).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

K_CTX_MASK = (1 << 16) - 1


@dataclasses.dataclass
class FqzParams:
    """Deserialized fqz5_fqz_dump_ctx parameter blob."""

    nparam: int
    gflags: int
    max_sel: int
    max_sym: int
    stab: np.ndarray          # (256,)
    qshift: np.ndarray        # (P,)
    qmask: np.ndarray
    qloc: np.ndarray
    sloc: np.ndarray
    context: np.ndarray
    do_sel: np.ndarray
    do_dedup: np.ndarray
    fixed_len: np.ndarray
    bbits: np.ndarray         # sequence-conditioning (kGUseSeq)
    bloc: np.ndarray
    boff: np.ndarray
    qmap: np.ndarray          # (P, 256)
    qtab: np.ndarray          # (P, 256)
    ptab: np.ndarray          # (P, 1024) pre-shifted by ploc
    dtab: np.ndarray          # (P, 256) pre-shifted by dloc

    @classmethod
    def parse(cls, blob: np.ndarray) -> "FqzParams":
        w = blob.astype(np.uint32)
        nparam, gflags, max_sel, max_sym = (int(w[0]), int(w[1]),
                                            int(w[2]), int(w[3]))
        off = 4
        stab = w[off:off + 256]
        off += 256
        scalars = {k: np.zeros(nparam, np.uint32) for k in
                   ("qshift", "qmask", "qloc", "sloc", "context",
                    "do_sel", "do_dedup", "fixed_len", "do_qa",
                    "do_r2", "bbits", "bloc", "boff")}
        qmap = np.zeros((nparam, 256), np.uint32)
        qtab = np.zeros((nparam, 256), np.uint32)
        ptab = np.zeros((nparam, 1024), np.uint32)
        dtab = np.zeros((nparam, 256), np.uint32)
        names = list(scalars)
        for j in range(nparam):
            for k in names:
                scalars[k][j] = w[off]
                off += 1
            qmap[j] = w[off:off + 256]
            off += 256
            qtab[j] = w[off:off + 256]
            off += 256
            ptab[j] = w[off:off + 1024]
            off += 1024
            dtab[j] = w[off:off + 256]
            off += 256
        return cls(nparam, gflags, max_sel, max_sym, stab,
                   scalars["qshift"], scalars["qmask"], scalars["qloc"],
                   scalars["sloc"], scalars["context"],
                   scalars["do_sel"], scalars["do_dedup"],
                   scalars["fixed_len"], scalars["bbits"],
                   scalars["bloc"], scalars["boff"],
                   qmap, qtab, ptab, dtab)


@jax.jit
def compute_contexts(quals, lens, pidx, sels, qmap, qtab, ptab, dtab,
                     qshift, qmask, qloc, sloc, context0,
                     bases=None, seq0=None, bbits=None, bloc=None):
    """Per-byte fqz contexts for R records at once.

    quals: (R, L) raw quality bytes (padded); lens: (R,); pidx: (R,)
    parameter index per record (stab[sel]); sels: (R,) selector
    values; tables indexed by pidx.  Sequence conditioning (kGUseSeq,
    fqzcomp_qual.c:386-388; native/fqzqual.cpp:214-215): bases (R, L)
    base codes consumed at each quality byte (seq[boff+k], 0 past the
    record end), seq0 (R,) the boff-base seed of the shift register,
    bbits/bloc indexed by pidx.  Returns (ctx (R, L) uint32, qm (R, L)
    uint8); entries past each record's length are garbage.
    """
    R, L = quals.shape
    pidx = pidx.astype(jnp.int32)
    if bases is None:
        bases = jnp.zeros_like(quals, dtype=jnp.int32)
        seq0 = jnp.zeros((R,), jnp.uint32)
        bmask_r = jnp.zeros((R,), jnp.uint32)
        bloc_r = jnp.zeros((R,), jnp.uint32)
    else:
        bmask_r = ((jnp.uint32(1) << bbits[pidx].astype(jnp.uint32))
                   - jnp.uint32(1))
        bloc_r = bloc[pidx].astype(jnp.uint32)
        seq0 = seq0.astype(jnp.uint32)

    qmap_r = qmap[pidx]           # (R, 256) — gathers once per batch
    qtab_r = qtab[pidx]
    dtab_r = dtab[pidx]
    ptab_r = ptab[pidx]
    qshift_r = qshift[pidx].astype(jnp.uint32)
    qmask_r = qmask[pidx].astype(jnp.uint32)
    qloc_r = qloc[pidx].astype(jnp.uint32)
    sterm = (sels.astype(jnp.uint32)
             << sloc[pidx].astype(jnp.uint32))
    ctx0 = context0[pidx].astype(jnp.uint32)
    lens = lens.astype(jnp.uint32)

    def step(carry, k):
        qctx, delta, prevq, seqreg = carry
        q = jnp.take_along_axis(quals, jnp.full((R, 1), k, jnp.int32),
                                axis=1)[:, 0]
        qm = jnp.take_along_axis(qmap_r, q[:, None].astype(jnp.int32),
                                 axis=1)[:, 0].astype(jnp.uint32)
        b = jnp.take_along_axis(bases, jnp.full((R, 1), k, jnp.int32),
                                axis=1)[:, 0].astype(jnp.uint32)
        # context for byte k+1 (byte 0 uses ctx0)
        qctx = (qctx << qshift_r) + jnp.take_along_axis(
            qtab_r, qm[:, None].astype(jnp.int32), axis=1)[:, 0]
        p = lens - k.astype(jnp.uint32)   # st.p before the decrement
        pterm = jnp.take_along_axis(
            ptab_r, jnp.minimum(p, 1023)[:, None].astype(jnp.int32),
            axis=1)[:, 0]
        dterm = jnp.take_along_axis(
            dtab_r, jnp.minimum(delta, 255)[:, None].astype(jnp.int32),
            axis=1)[:, 0]
        seqreg = ((seqreg << 2) | b) & bmask_r
        ctx = (((qctx & qmask_r) << qloc_r) + pterm + dterm + sterm
               + (seqreg << bloc_r)) & jnp.uint32(K_CTX_MASK)
        delta = delta + (prevq != qm).astype(jnp.uint32)
        prevq = qm
        return (qctx, delta, prevq, seqreg), (ctx, qm)

    z = jnp.zeros((R,), jnp.uint32)
    (_, _, _, _), (ctxs, qms) = jax.lax.scan(
        step, (z, z, z, seq0), jnp.arange(L, dtype=jnp.int32))
    # ctxs[k] is the context for byte k+1; byte 0 takes context0
    ctxs = jnp.swapaxes(ctxs, 0, 1)       # (R, L)
    qms = jnp.swapaxes(qms, 0, 1)
    ctx_out = jnp.concatenate([ctx0[:, None], ctxs[:, :-1]], axis=1)
    return ctx_out, qms.astype(jnp.uint8)
