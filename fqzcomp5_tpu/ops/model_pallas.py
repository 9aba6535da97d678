"""Pallas TPU kernel for pass-2 AdaptiveModel evolution.

The lax.scan formulation (fqz_model_jax.evolve) pays XLA per-step
overheads and materialises full intermediate tiles each step; this
kernel keeps the model state resident in VMEM across the whole
occurrence walk.

Orientation: CONTEXTS ride the 128 lanes, the model's symbol array
rides the sublane dim (ARR=128 rows).  That puts every per-step
dynamic index on a tile-friendly dim: the occurrence column reads as
`sym_ref[t]` from a (Tc, C_BLK) input block, and the per-step outputs
write as `out_ref[t]` rows — no dynamic lane indexing anywhere
(Mosaic cannot prove lane-dim slices aligned; the first version of
this kernel failed remote compile exactly there).

Outputs are two packed planes:

  out1[t, c] = cum << 16 | freq       (both < 2^16 by construction)
  out2[t, c] = tot

Step math mirrors c_simple_model.h:63-171 exactly (STEP bump,
normalise at MAX_FREQ = (1<<16)-17 with zero-preserving halving, and
the adjacent bubble swap — symbol order is coded state), so the
triples are bit-identical to the scan path; tests compare both.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ARR = 128            # model array capacity (sublane dim)
K_MAX_FREQ = (1 << 16) - 17
C_BLK = 128          # contexts per grid cell (lane dim)


def _slot_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (ARR, 1), 0)


def _evolve_kernel(step_inc: int, Tc: int, sym_ref, counts_ref, ms_ref,
                   out1_ref, out2_ref, symv_st, freqv_st, tot_st):
    t_idx = pl.program_id(1)
    slot = _slot_iota()

    @pl.when(t_idx == 0)
    def _():
        ms = ms_ref[:]                       # (1, C_BLK)
        symv_st[:] = jnp.broadcast_to(slot, symv_st.shape)
        freqv_st[:] = jnp.where(slot < ms, 1, 0)
        tot_st[:] = jnp.broadcast_to(ms, tot_st.shape)

    def step(t_loc, _):
        t_global = t_idx * Tc + t_loc
        symv = symv_st[:]                    # (ARR, C_BLK)
        freqv = freqv_st[:]
        tot = tot_st[:]                      # (ARR, C_BLK) replicated

        s = sym_ref[t_loc]                   # (1, C_BLK)
        active = t_global < counts_ref[:]    # (1, C_BLK)

        onpos = (symv == s).astype(jnp.int32)
        # slots >= pos == inclusive top-down OR scan over sublanes
        ge = onpos
        for d in (1, 2, 4, 8, 16, 32, 64):
            sh = pltpu.roll(ge, d, axis=0)
            ge = ge | jnp.where(slot >= d, sh, 0)
        lt = 1 - ge

        f = jnp.sum(onpos * freqv, axis=0, keepdims=True)
        cum = jnp.sum(lt * freqv, axis=0, keepdims=True)

        # bump
        freq2 = freqv + onpos * step_inc
        tot2 = tot + step_inc
        # normalise on overflow (zeros stay zero)
        over = tot2 > K_MAX_FREQ
        fn = freq2 - (freq2 >> 1)
        freq2 = jnp.where(over, fn, freq2)
        tot2 = jnp.where(over, jnp.sum(freq2, axis=0, keepdims=True),
                         tot2)
        # bubble: swap pos-1 <-> pos when freq[pos] > freq[pos-1]
        fval = jnp.sum(onpos * freq2, axis=0, keepdims=True)
        onprev = pltpu.roll(onpos, ARR - 1, axis=0) \
            * (slot < ARR - 1)
        fprev = jnp.sum(onprev * freq2, axis=0, keepdims=True)
        sprev = jnp.sum(onprev * symv, axis=0, keepdims=True)
        pos_nonzero = 1 - onpos[0:1, :]   # pos > 0 <=> slot 0 not pos
        do = (fval > fprev) & (pos_nonzero > 0)
        onpos_b = onpos > 0
        onprev_b = onprev > 0
        symv2 = jnp.where(do & onpos_b, sprev,
                          jnp.where(do & onprev_b, s, symv))
        freq3 = jnp.where(do & onpos_b, fprev,
                          jnp.where(do & onprev_b, fval, freq2))

        symv_st[:] = jnp.where(active, symv2, symv)
        freqv_st[:] = jnp.where(active, freq3, freqv)
        tot_st[:] = jnp.where(active, tot2, tot)

        out1_ref[t_loc] = ((cum << 16) | f)[0]
        out2_ref[t_loc] = tot[0:1, :][0]
        return 0

    jax.lax.fori_loop(0, Tc, step, 0)


@functools.partial(jax.jit, static_argnames=("step_inc", "interpret"))
def evolve_walk(symplane, counts, max_sym, step_inc: int = 16,
                interpret: bool = False):
    """Pallas pass-2 walk.  symplane: (C, T) int32 (C a multiple of
    C_BLK, T a multiple of 128); counts, max_sym: (C, 1) int32.
    Returns (cum, freq, tot) uint32 (C, T) planes, bit-identical to
    fqz_model_jax.evolve."""
    C, T = symplane.shape
    assert C % C_BLK == 0 and T % 128 == 0
    Tc = 128
    grid = (C // C_BLK, T // Tc)

    # T-leading layouts inside the kernel
    symT = jnp.swapaxes(symplane.astype(jnp.int32), 0, 1)  # (T, C)
    blk = pl.BlockSpec((Tc, C_BLK), lambda c, t: (t, c),
                       memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, C_BLK), lambda c, t: (0, c),
                       memory_space=pltpu.VMEM)
    out1, out2 = pl.pallas_call(
        functools.partial(_evolve_kernel, step_inc, Tc),
        grid=grid,
        in_specs=[blk, row, row],
        out_specs=[blk, blk],
        out_shape=[jax.ShapeDtypeStruct((T, C), jnp.int32),
                   jax.ShapeDtypeStruct((T, C), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((ARR, C_BLK), jnp.int32)
                        for _ in range(3)],
        interpret=interpret,
    )(symT, counts.astype(jnp.int32).reshape(1, C),
      max_sym.astype(jnp.int32).reshape(1, C))
    cum = jnp.swapaxes(out1.astype(jnp.uint32) >> 16, 0, 1)
    freq = jnp.swapaxes(out1.astype(jnp.uint32) & 0xFFFF, 0, 1)
    tot = jnp.swapaxes(out2.astype(jnp.uint32), 0, 1)
    return cum, freq, tot
