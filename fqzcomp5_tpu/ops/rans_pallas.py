"""Pallas TPU kernel for the batched 32-lane rANS encode walk.

Replaces the `lax.scan` formulation (ops/rans_jax.py) on real TPUs: the
whole T-step walk runs inside one kernel, so a symbol step costs a few
VPU instructions on a (rows, 128) tile instead of an XLA scan iteration
over tiny (B, 32) tensors.

Design notes (hardware mapping):
- 4 streams x 32 rANS states share one 128-lane vector row; many rows
  stack along sublanes, giving the dependency chain R->R independent
  work to hide VPU latency.
- The per-symbol table values collapse into ONE int32 plane
  P = (freq << shift) | start  (both < 2^13/2^12), so HBM traffic is
  4B/sym in; the kernel emits word|(emit<<16), 4B/sym out.  The plane
  is a trivial table gather producible on host (numpy) or device.
- Instead of the reference's reciprocal-multiply (rANS_word.h:195-260,
  a 32x32->hi32 chain), the quotient q = R/f uses an approximate f32
  reciprocal + one Newton step + truncate + exact +-1 integer
  correction.  Post-renormalisation R < f << (31-shift), so the float
  error is < 1 unit and the correction restores the exact floor ->
  bit-identical streams (verified against encode_scan_flat and the
  native codec in tests).
- T leads the array layout so the per-step dynamic index lands on an
  untiled dimension (Mosaic requires tiled-dim indices be provably
  aligned).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 32
RANS_L = 1 << 15
S_PER_ROW = 4           # streams per 128-lane row
LANES = S_PER_ROW * N   # 128


def build_packed_tables(freqs: np.ndarray, shift: int) -> np.ndarray:
    """(B, S+1) int32 packed (f << shift) | start tables.

    freqs: (B, ..., 256) where each trailing 256-row is one context's
    frequency table normalised to sum 1<<shift (order-0: (B, 256);
    order-1: (B, 256, 256) — starts are per-context cumsums).  The
    tables flatten to S entries per stream; index S is the identity
    sentinel (f = 1<<shift, start = 0)."""
    freqs = np.atleast_2d(freqs).astype(np.int64)
    B = freqs.shape[0]
    start = np.cumsum(freqs, axis=-1) - freqs
    packed = ((freqs << shift) | start).reshape(B, -1)
    S = packed.shape[1]
    out = np.zeros((B, S + 1), np.int32)
    out[:, :S] = packed.astype(np.int32)
    out[:, S] = 1 << (2 * shift)
    return out


def _encode_kernel(shift: int, Tc: int, p_ref, r0_ref, out_ref, rf_ref,
                   R_state):
    """One (Tc, rows, 128) chunk of the reversed walk.  Grid dim 0 walks
    stream-row blocks, grid dim 1 walks T chunks in reverse; R_state
    persists across the T dimension (TPU grids run sequentially)."""
    t_idx = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(t_idx == 0)
    def _():
        R_state[:] = r0_ref[:]

    def step(s, _):
        # s runs 0..Tc-1; the walk is reversed, so take step Tc-1-s
        k = Tc - 1 - s
        R = R_state[:]
        P = p_ref[k]
        f = jax.lax.shift_right_logical(P, shift)
        start = P & ((1 << shift) - 1)

        # renormalise when R > x_max = (f << (31-shift)) - 1, i.e.
        # R >> (31-shift) >= f  (avoids int32 overflow at f = 1<<shift)
        emit = jax.lax.shift_right_logical(R, 31 - shift) >= f
        out_ref[k] = (R & 0xFFFF) | (emit.astype(jnp.int32) << 16)
        R = jnp.where(emit, jax.lax.shift_right_logical(R, 16), R)

        # q = R // f: IEEE f32 divide keeps the error under one unit
        # (q < 2^21, rel err ~2^-23); the +-1 integer corrections make
        # the floor exact.  Two rounds are insurance against a backend
        # whose divide is a reciprocal approximation (~2 units off).
        ff = f.astype(jnp.float32)
        q = (R.astype(jnp.float32) / ff).astype(jnp.int32)
        r = R - q * f
        for _ in range(2):
            fix_lo = r < 0
            q = jnp.where(fix_lo, q - 1, q)
            r = jnp.where(fix_lo, r + f, r)
            fix_hi = r >= f
            q = jnp.where(fix_hi, q + 1, q)
            r = jnp.where(fix_hi, r - f, r)

        R_state[:] = (q << shift) + r + start
        return 0

    jax.lax.fori_loop(0, Tc, step, 0)

    @pl.when(t_idx == n_t - 1)
    def _():
        rf_ref[:] = R_state[:]


@functools.partial(jax.jit, static_argnames=("shift", "interpret"))
def encode_walk(P, R0, shift: int = 12, interpret: bool = False):
    """Reversed encode walk over packed value planes.

    P: (T, B4, 128) int32 = (f<<shift)|start per symbol step (streams
    packed 4-per-row, T leading); R0: (B4, 128) int32 initial states.
    Returns (Rf (B4,128) int32, out (T,B4,128) int32 word|(emit<<16))."""
    T, B4, L = P.shape
    assert L == LANES
    rows = min(B4, 64)
    while B4 % rows:
        rows -= 1
    # VMEM budget: (in + out) * double-buffer * Tc*rows*128*4B <~ 12MB
    Tc = max(1, min(T, (12 << 20) // (rows * LANES * 4 * 4)))
    while T % Tc:
        Tc -= 1
    grid = (B4 // rows, T // Tc)
    nt = grid[1]

    val_spec = pl.BlockSpec(
        (Tc, rows, LANES),
        lambda b, t: (nt - 1 - t, b, 0),
        memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec(
        (rows, LANES), lambda b, t: (b, 0), memory_space=pltpu.VMEM)

    out, Rf = pl.pallas_call(
        functools.partial(_encode_kernel, shift, Tc),
        grid=grid,
        in_specs=[val_spec, state_spec],
        out_specs=[val_spec, state_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, B4, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B4, LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((rows, LANES), jnp.int32)],
        interpret=interpret,
    )(P, R0)
    return Rf, out


def _pack_rows(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 32) -> (ceil(B/4), T, 128) with stream b in lane block
    (b%4)*32:(b%4+1)*32 of row b//4."""
    B, T, n = x.shape
    pad = (-B) % S_PER_ROW
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, T, n), x.dtype)], axis=0)
    B4 = x.shape[0] // S_PER_ROW
    return (x.reshape(B4, S_PER_ROW, T, n)
            .transpose(0, 2, 1, 3).reshape(B4, T, LANES))


def _unpack_rows(x: jnp.ndarray, B: int) -> jnp.ndarray:
    """Inverse of _pack_rows for (B4, T, 128) -> (B, T, 32)."""
    B4, T, L = x.shape
    out = (x.reshape(B4, T, S_PER_ROW, N).transpose(0, 2, 1, 3)
           .reshape(B4 * S_PER_ROW, T, N))
    return out[:B]


def pack_plane_host(flat: np.ndarray, packed_tables: np.ndarray,
                    shift: int) -> np.ndarray:
    """Host-side plane build: (B, T, 32) indices + (B, S+1) packed
    tables -> (T, ceil(B/4), 128) int32, identity-padded."""
    B, T, n = flat.shape
    P = np.take_along_axis(
        packed_tables, flat.reshape(B, -1), axis=1).reshape(B, T, n)
    pad = (-B) % S_PER_ROW
    if pad:
        ident = np.full((pad, T, n), 1 << (2 * shift), np.int32)
        P = np.concatenate([P, ident], axis=0)
    B4 = P.shape[0] // S_PER_ROW
    return np.ascontiguousarray(
        P.reshape(B4, S_PER_ROW, T, n).transpose(2, 0, 1, 3)
        .reshape(T, B4, LANES))


@functools.partial(jax.jit, static_argnames=("shift", "interpret"))
def encode_scan_flat_pallas(flat, packed_tables, R0=None, shift: int = 12,
                            interpret: bool = False):
    """Drop-in for rans_jax.encode_scan_flat: (B, T, N) table indices +
    (B, S+1) int32 packed tables -> (Rf (B,N) uint32, words (B,T,N)
    uint32, mask (B,T,N) bool)."""
    B, T, n = flat.shape
    P = jnp.take_along_axis(
        packed_tables, flat.reshape(B, -1).astype(jnp.int32),
        axis=1).reshape(B, T, n)
    pad = (-B) % S_PER_ROW
    PB = _pack_rows(P)
    if pad:
        PB = jnp.where(PB == 0, jnp.int32(1 << (2 * shift)), PB)
    PB = jnp.swapaxes(PB, 0, 1)  # (T, B4, 128)
    if R0 is None:
        R0i = jnp.full((B, 1, N), RANS_L, jnp.int32)
    else:
        R0i = R0.astype(jnp.int32).reshape(B, 1, N)
    R0p = _pack_rows(R0i)[:, 0, :]
    Rf, out = encode_walk(PB, R0p, shift=shift, interpret=interpret)
    out = _unpack_rows(jnp.swapaxes(out, 0, 1), B)
    Rf = _unpack_rows(Rf[:, None, :], B)[:, 0, :].astype(jnp.uint32)
    words = (out & 0xFFFF).astype(jnp.uint32)
    mask = (out >> 16).astype(jnp.bool_)
    return Rf, words, mask
