"""Pallas TPU kernel for pass-2 AdaptiveModel evolution.

The lax.scan formulation (fqz_model_jax.evolve) pays XLA per-step
overheads and materialises full intermediate tiles each step; this
kernel keeps the model state — (C_BLK, LANES) symbol and frequency
tiles plus replicated totals — resident in VMEM across the whole
occurrence walk and writes two packed output planes per step:

  out1[c, t] = cum << 16 | freq       (both < 2^16 by construction)
  out2[c, t] = tot

Step math mirrors c_simple_model.h:63-171 exactly (STEP bump,
normalise at MAX_FREQ = (1<<16)-17 with zero-preserving halving, and
the adjacent bubble swap — symbol order is coded state), so the
triples are bit-identical to the scan path; tests compare both.

Layout choices:
- contexts ride the SUBLANE dim (C_BLK rows per grid cell), the
  model's symbol array rides the 128 lanes (256-symbol models use two
  logical lanes per slot via a second kernel instantiation with
  LANES=256 folded into two 128-lane registers — not yet needed: the
  wave batches route 256-symbol rows through the scan path).
- the per-step column sym[:, t] reads via a dynamic lane slice; the
  lane>=pos mask comes from a log-step inclusive OR scan of the
  one-hot, so no per-symbol loop exists anywhere.
- grid = (C blocks, T chunks); T chunks run sequentially with state
  carried in scratch, C blocks are independent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
K_MAX_FREQ = (1 << 16) - 17
C_BLK = 128          # contexts per grid cell


def _lane_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)


def _evolve_kernel(step_inc: int, Tc: int, sym_ref, counts_ref, ms_ref,
                   out1_ref, out2_ref, symv_st, freqv_st, tot_st):
    t_idx = pl.program_id(1)
    lane = _lane_iota()

    @pl.when(t_idx == 0)
    def _():
        ms = ms_ref[:]
        symv_st[:] = jnp.broadcast_to(lane, symv_st.shape)
        freqv_st[:] = jnp.where(lane < ms, 1, 0)
        tot_st[:] = jnp.broadcast_to(ms, tot_st.shape)

    def step(s_loc, _):
        t_global = t_idx * Tc + s_loc
        symv = symv_st[:]
        freqv = freqv_st[:]
        tot = tot_st[:]

        s = sym_ref[:, pl.ds(s_loc, 1)]            # (C_BLK, 1)
        active = t_global < counts_ref[:]

        onpos = (symv == s).astype(jnp.int32)
        # lanes >= pos  ==  inclusive left-to-right OR scan of onpos
        ge = onpos
        for d in (1, 2, 4, 8, 16, 32, 64):
            sh = pltpu.roll(ge, d, axis=1)
            ge = ge | jnp.where(lane >= d, sh, 0)
        lt = 1 - ge

        f = jnp.sum(onpos * freqv, axis=1, keepdims=True)
        cum = jnp.sum(lt * freqv, axis=1, keepdims=True)

        # bump
        freq2 = freqv + onpos * step_inc
        tot2 = tot + step_inc
        # normalise on overflow (zeros stay zero)
        over = tot2 > K_MAX_FREQ
        fn = freq2 - (freq2 >> 1)
        freq2 = jnp.where(over, fn, freq2)
        tot2 = jnp.where(over, jnp.sum(freq2, axis=1, keepdims=True),
                         tot2)
        # bubble: swap pos-1 <-> pos when freq[pos] > freq[pos-1]
        fval = jnp.sum(onpos * freq2, axis=1, keepdims=True)
        onprev = pltpu.roll(onpos, LANES - 1, axis=1) \
            * (lane < LANES - 1)
        fprev = jnp.sum(onprev * freq2, axis=1, keepdims=True)
        sprev = jnp.sum(onprev * symv, axis=1, keepdims=True)
        pos_nonzero = 1 - onpos[:, 0:1]   # pos > 0 <=> lane 0 not pos
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

        packed = (cum << 16) | f
        col = lane == s_loc
        out1_ref[:, :] = jnp.where(col, packed, out1_ref[:, :])
        out2_ref[:, :] = jnp.where(col, tot, out2_ref[:, :])
        return 0

    jax.lax.fori_loop(0, Tc, step, 0)


@functools.partial(jax.jit, static_argnames=("step_inc", "interpret"))
def evolve_walk(symplane, counts, max_sym, step_inc: int = 16,
                interpret: bool = False):
    """Pallas pass-2 walk.  symplane: (C, T) int32 (C a multiple of
    C_BLK, T a multiple of the chunk = 128 lanes per output tile);
    counts, max_sym: (C, 1) int32.  Returns (cum, freq, tot) uint32
    (C, T) planes, bit-identical to fqz_model_jax.evolve."""
    C, T = symplane.shape
    assert C % C_BLK == 0 and T % LANES == 0
    Tc = LANES
    grid = (C // C_BLK, T // Tc)

    blk = pl.BlockSpec((C_BLK, Tc), lambda c, t: (c, t),
                       memory_space=pltpu.VMEM)
    row = pl.BlockSpec((C_BLK, 1), lambda c, t: (c, 0),
                       memory_space=pltpu.VMEM)
    out1, out2 = pl.pallas_call(
        functools.partial(_evolve_kernel, step_inc, Tc),
        grid=grid,
        in_specs=[blk, row, row],
        out_specs=[blk, blk],
        out_shape=[jax.ShapeDtypeStruct((C, T), jnp.int32),
                   jax.ShapeDtypeStruct((C, T), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((C_BLK, LANES), jnp.int32)
                        for _ in range(3)],
        interpret=interpret,
    )(symplane.astype(jnp.int32), counts.astype(jnp.int32),
      max_sym.astype(jnp.int32))
    cum = out1.astype(jnp.uint32) >> 16
    freq = out1.astype(jnp.uint32) & 0xFFFF
    tot = out2.astype(jnp.uint32)
    return cum, freq, tot
