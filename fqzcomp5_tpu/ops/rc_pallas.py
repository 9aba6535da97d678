"""Pallas TPU kernel for the pass-3 range-coder encode walk.

Pass 3 of the adaptive-codec decomposition serializes every
fqz-qual/SEQ/arith stream through the carry-counting range coder
(native/rc.h, htscodecs/c_range_coder.h:26-166).  The lax.scan
formulation (ops/rc_jax.py::encode_scan) pays XLA per-step overheads;
this kernel keeps the five u32 state registers resident in VMEM across
the whole walk — the same treatment that took pass-2 model evolution
from 122 to 682 M updates/s on v5e.

Layout: independent streams ride the 128 lanes ((rows, 128) tiles,
rows of streams stacked), T leads the input/event planes so each
step's access is an untiled dim-0 index.  Inputs pack per symbol as

  P0[t] = cum << 16 | freq          (both < 2^16: tot < 2^16)
  P1[t] = active << 16 | tot

Events: each step runs at most two conditional shift_lows; slot k
writes two planes

  ffk[t]  = ff run length (full width — the run is data)
  evk[t]  = flush << 16 | (carry & 0xFF) << 8 | (cache & 0xFF)

Only carry's low byte affects output bytes ((cache+carry) & 0xFF and
(carry-1) & 0xFF runs, rc.h:92-106), so 8 packed bits are exact; the
carried STATE keeps full width.  The u32 arithmetic runs in int32 with
xor-bias unsigned compares; `range / tot` is an exact base-256
schoolbook division (digit dividends < 256*tot < 2^24, f32-exact, one
+-1 correction per digit).

Bit-exact vs encode_scan / the native coder (tests/test_rc_device.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
K_TOP = 1 << 24
K_THRESH = 0xFF000000 - (1 << 32)   # as int32 bits
MIN32 = -(1 << 31)


def _u_lt(a, b):
    """Unsigned a < b on int32 bit patterns."""
    return (a ^ MIN32) < (b ^ MIN32)


def _lsr(a, k):
    return jax.lax.shift_right_logical(a, k)


def _div_u32_u16(rng, tot):
    """floor(u32(rng) / tot) for 1 <= tot < 2^16, exact: four base-256
    digits, each dividend < 256 * tot < 2^24 (f32-exact, +-1 fix)."""
    inv = 1.0 / tot.astype(jnp.float32)
    q = jnp.zeros_like(rng)
    rem = jnp.zeros_like(rng)
    for k in (24, 16, 8, 0):
        d = (rem << 8) | (_lsr(rng, k) & 0xFF)
        qd = (d.astype(jnp.float32) * inv).astype(jnp.int32)
        r = d - qd * tot
        neg = r < 0
        qd = jnp.where(neg, qd - 1, qd)
        r = jnp.where(neg, r + tot, r)
        over = r >= tot
        qd = jnp.where(over, qd + 1, qd)
        rem = jnp.where(over, r - tot, r)
        q = (q << 8) | qd
    return q


def _rc_kernel(Tc: int, p0_ref, p1_ref, s0l, s0r, s0c, s0f, s0y,
               ff0_ref, ev0_ref, ff1_ref, ev1_ref,
               sfl, sfr, sfc, sff, sfy,
               low_st, rng_st, ca_st, ff_st, cy_st):
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        low_st[:] = s0l[:]
        rng_st[:] = s0r[:]
        ca_st[:] = s0c[:]
        ff_st[:] = s0f[:]
        cy_st[:] = s0y[:]

    def step(t, _):
        low0, rng0 = low_st[:], rng_st[:]
        ca0, ffn0, cy0 = ca_st[:], ff_st[:], cy_st[:]

        p0 = p0_ref[t]
        p1 = p1_ref[t]
        cum = _lsr(p0, 16)
        f = p0 & 0xFFFF
        tot = p1 & 0xFFFF
        act = (p1 & (1 << 16)) != 0

        rng2 = _div_u32_u16(rng0, tot)
        low = low0 + cum * rng2
        rng = rng2 * f
        cy = cy0 + _u_lt(low, low0).astype(jnp.int32)
        ca, ffn = ca0, ffn0

        evs = []
        for _slot in range(2):
            need = _u_lt(rng, K_TOP)
            flush = _u_lt(low, K_THRESH) | (cy != 0)
            e = (flush & need & act, ffn, ca, cy)
            ca = jnp.where(need & flush, _lsr(low, 24), ca)
            ffn = jnp.where(need, jnp.where(flush, 0, ffn + 1), ffn)
            cy = jnp.where(need & flush, 0, cy)
            low = jnp.where(need, low << 8, low)
            rng = jnp.where(need, rng << 8, rng)
            evs.append(e)

        low_st[:] = jnp.where(act, low, low0)
        rng_st[:] = jnp.where(act, rng, rng0)
        ca_st[:] = jnp.where(act, ca, ca0)
        ff_st[:] = jnp.where(act, ffn, ffn0)
        cy_st[:] = jnp.where(act, cy, cy0)

        (fl0, f0, c0, y0), (fl1, f1, c1, y1) = evs
        ff0_ref[t] = f0
        ev0_ref[t] = (fl0.astype(jnp.int32) << 16) \
            | ((y0 & 0xFF) << 8) | (c0 & 0xFF)
        ff1_ref[t] = f1
        ev1_ref[t] = (fl1.astype(jnp.int32) << 16) \
            | ((y1 & 0xFF) << 8) | (c1 & 0xFF)
        return 0

    jax.lax.fori_loop(0, Tc, step, 0)

    @pl.when(t_idx == pl.num_programs(1) - 1)
    def _():
        sfl[:] = low_st[:]
        sfr[:] = rng_st[:]
        sfc[:] = ca_st[:]
        sff[:] = ff_st[:]
        sfy[:] = cy_st[:]


@functools.partial(jax.jit, static_argnames=("T", "interpret"))
def _rc_call(P0, P1, s0, T: int, interpret: bool = False):
    Tp, R, L = P0.shape
    assert L == LANES and Tp >= T
    rows = min(R, 8)
    while R % rows:
        rows -= 1
    Tc = max(1, min(Tp, 128))
    while Tp % Tc:
        Tc -= 1
    grid = (R // rows, Tp // Tc)

    state_spec = pl.BlockSpec((rows, LANES), lambda b, t: (b, 0),
                              memory_space=pltpu.VMEM)
    plane_spec = pl.BlockSpec((Tc, rows, LANES), lambda b, t: (t, b, 0),
                              memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_rc_kernel, Tc),
        grid=grid,
        in_specs=[plane_spec, plane_spec] + [state_spec] * 5,
        out_specs=[plane_spec] * 4 + [state_spec] * 5,
        out_shape=[jax.ShapeDtypeStruct((Tp, R, LANES), jnp.int32)] * 4
        + [jax.ShapeDtypeStruct((R, LANES), jnp.int32)] * 5,
        scratch_shapes=[pltpu.VMEM((rows, LANES), jnp.int32)
                        for _ in range(5)],
        interpret=interpret,
    )(P0, P1, *s0)
    return outs


@jax.jit
def _event_totals(ff0, ev0, ff1, ev1):
    """Per-stream output byte count for one chunk's event planes:
    sum over flush events of (1 + ff)."""
    Tp, R, L = ev0.shape
    Bp = R * L

    def row(ev, ff):
        fl = (ev >> 16) & 1
        k = fl * (1 + ff)
        return k.reshape(Tp, Bp).sum(0)

    return row(ev0, ff0) + row(ev1, ff1)


@functools.partial(jax.jit, static_argnames=("outcap",))
def _compact_events(ff0, ev0, ff1, ev1, *, outcap: int):
    """Expand event planes into dense per-stream output bytes ON
    DEVICE (the shift_low semantics of rc_jax.assemble_stream: a flush
    emits (cache+carry)&0xFF then ff bytes of (carry-1)&0xFF).  The
    link then carries ~1 byte per OUTPUT byte instead of the 16 bytes
    per coded SYMBOL the raw planes cost — the adaptive codecs'
    dominant downstream traffic.  Returns (bytes (Bp, outcap) u8,
    totals (Bp,) i32); bytes[b, totals[b]:] is zero padding."""
    Tp, R, L = ev0.shape
    Bp = R * L
    # (Tp, R, 128) planes -> (Bp, E) event sequences, slot0 before
    # slot1 within a step
    e0 = jnp.swapaxes(ev0.reshape(Tp, Bp), 0, 1)
    e1 = jnp.swapaxes(ev1.reshape(Tp, Bp), 0, 1)
    f0 = jnp.swapaxes(ff0.reshape(Tp, Bp), 0, 1)
    f1 = jnp.swapaxes(ff1.reshape(Tp, Bp), 0, 1)
    ev = jnp.stack([e0, e1], axis=-1).reshape(Bp, 2 * Tp)
    ff = jnp.stack([f0, f1], axis=-1).reshape(Bp, 2 * Tp)
    fl = (ev >> 16) & 1
    ca = ev & 0xFF
    cy = (ev >> 8) & 0xFF
    k = fl * (1 + ff)                       # bytes per event
    cumk = jnp.cumsum(k, axis=1)            # inclusive
    total = cumk[:, -1]
    fb = (ca + cy) & 0xFF                   # first byte per event
    rb = (cy - 1) & 0xFF                    # 0xFF-run byte per event
    j = jnp.arange(outcap, dtype=jnp.int32)
    # covering event per output position: binary search instead of a
    # scatter (TPU scatters serialize)
    e_idx = jax.vmap(
        lambda row: jnp.searchsorted(row, j, side="right"))(cumk)
    e_idx = jnp.minimum(e_idx, 2 * Tp - 1)
    g = lambda a: jnp.take_along_axis(a, e_idx, axis=1)  # noqa: E731
    first_pos = g(cumk) - g(k)
    byte = jnp.where(j[None, :] == first_pos, g(fb), g(rb))
    byte = jnp.where(j[None, :] < total[:, None], byte, 0)
    return byte.astype(jnp.uint8), total


@functools.partial(jax.jit, static_argnames=("Tp", "R"))
def _pack_planes_idx(Vc, Vf, Vt, idx, *, Tp: int, R: int):
    """Gather (cum, freq, tot) planes from device-resident pass-2
    vectors by event index and pack them into the kernel's
    (Tp, R, 128) P0/P1 layout — the pass-2 -> pass-3 handoff never
    touches the host.  idx == len(V)-1 is the inactive sentinel."""
    B, T = idx.shape
    Bp = R * LANES
    sent = Vc.shape[0] - 1
    act = idx != sent
    cum = jnp.take(Vc, idx, axis=0)
    freq = jnp.take(Vf, idx, axis=0)
    tot = jnp.take(Vt, idx, axis=0)

    def pad(x, fillB, fillT):
        if Tp != T:
            x = jnp.concatenate(
                [x, jnp.full((B, Tp - T), fillT, x.dtype)], 1)
        if Bp != B:
            x = jnp.concatenate(
                [x, jnp.full((Bp - B, Tp), fillB, x.dtype)], 0)
        return x

    cum = pad(cum, 0, 0)
    freq = pad(freq, 1, 1)
    tot = pad(tot, 2, 2)
    act = pad(act.astype(jnp.int32), 0, 0)
    P0 = (cum << 16) | freq
    P1 = (act << 16) | tot
    P0 = jnp.transpose(P0.reshape(R, LANES, Tp), (2, 0, 1))
    P1 = jnp.transpose(P1.reshape(R, LANES, Tp), (2, 0, 1))
    return P0, P1


def _pack_state_rows(state0, B: int, R: int):
    """Host-pack the 5 coder registers into (R, 128) int32 rows (pad
    streams get the init state)."""
    Bp = R * LANES
    if state0 is None:
        z = np.zeros(B, np.uint32)
        state0 = (z, np.full(B, 0xFFFFFFFF, np.uint32), z, z, z)
    s0 = []
    defaults = (0, 0xFFFFFFFF, 0, 0, 0)
    for k, st in enumerate(state0):
        p = np.full(Bp, defaults[k], np.uint32)
        p[:B] = np.asarray(st, np.uint32)
        s0.append(jnp.asarray(p.reshape(R, LANES).view(np.int32)))
    return s0


def encode_walk_compact_idx(V, idx_np, state0=None,
                            interpret: bool = False):
    """encode_walk_compact fed by INDEX planes into device-resident
    pass-2 output vectors V = (cum, freq, tot) int32 (each with the
    sentinel entry appended last).  The link carries 4 B per event
    (the int32 index) up and ~1 B per output byte down; the triples
    themselves never move.  Returns (state, bytes (B, cap) u8,
    totals (B,))."""
    from fqzcomp5_tpu.ops import backend, devtimer

    Vc, Vf, Vt = V
    B, T = idx_np.shape
    R = max(1, -(-B // LANES))
    while R & (R - 1):
        R += 1
    Tp = -(-T // 128) * 128
    s0 = _pack_state_rows(state0, B, R)
    idx_d = devtimer.put(np.ascontiguousarray(idx_np, np.int32))
    outs = devtimer.compute(lambda: _rc_call(
        *_pack_planes_idx(Vc, Vf, Vt, idx_d, Tp=Tp, R=R),
        s0, T=Tp, interpret=interpret))
    Bp = R * LANES
    statef = tuple(np.asarray(x).view(np.uint32).reshape(Bp)[:B]
                   for x in outs[4:])
    ff0, ev0, ff1, ev1 = outs[:4]
    totals = devtimer.get(_event_totals(ff0, ev0, ff1, ev1))
    outcap = backend._bucket(max(int(totals[:B].max()), 1), lo=128)
    by, _ = devtimer.compute(lambda: _compact_events(
        ff0, ev0, ff1, ev1, outcap=outcap))
    by = devtimer.get(by[:B])
    return statef, by, totals[:B].astype(np.int64)


def encode_walk_compact(cum, freq, tot, active=None, state0=None,
                        interpret: bool = False):
    """encode_walk, but the event planes never leave the device: the
    chunk's output BYTES are assembled on device and downloaded dense
    (state, bytes (B, cap) u8, totals (B,) — stream b's chunk payload
    is bytes[b, :totals[b]])."""
    from fqzcomp5_tpu.ops import backend, devtimer

    outs, statef, B, _T, _Tp, _Bp = _walk_planes(
        cum, freq, tot, active, state0, interpret)
    ff0, ev0, ff1, ev1 = outs[:4]
    totals = devtimer.get(_event_totals(ff0, ev0, ff1, ev1))
    outcap = backend._bucket(max(int(totals[:B].max()), 1), lo=128)
    by, _ = devtimer.compute(lambda: _compact_events(
        ff0, ev0, ff1, ev1, outcap=outcap))
    by = devtimer.get(by[:B])   # device slice: pad rows never download
    return statef, by, totals[:B].astype(np.int64)


def _walk_planes(cum, freq, tot, active, state0, interpret):
    """Shared plane prep + kernel call: returns (device outs, final
    state as numpy, B, Tp)."""
    cum = np.asarray(cum, np.uint32)
    freq = np.asarray(freq, np.uint32)
    tot = np.asarray(tot, np.uint32)
    B, T = cum.shape
    R = max(1, -(-B // LANES))
    while R & (R - 1):
        R += 1   # pow2 rows: min(R, 8) always divides (Mosaic tiling)
    Bp = R * LANES
    Tp = -(-T // 128) * 128   # padded steps run inactive

    def plane(x, fill):
        p = np.full((Bp, Tp), fill, np.uint32)
        p[:B, :T] = x
        return p

    c = plane(cum, 0)
    f = plane(freq, 1)
    t_ = plane(tot, 2)
    a = np.zeros((Bp, Tp), bool)
    a[:B, :T] = True if active is None else np.asarray(active, bool)

    P0 = (c << 16) | f
    P1 = (a.astype(np.uint32) << 16) | t_
    # T-leading planes, (T, R, 128)
    P0 = np.ascontiguousarray(
        P0.reshape(R, LANES, Tp).transpose(2, 0, 1)).view(np.int32)
    P1 = np.ascontiguousarray(
        P1.reshape(R, LANES, Tp).transpose(2, 0, 1)).view(np.int32)

    if state0 is None:
        z = np.zeros(B, np.uint32)
        state0 = (z, np.full(B, 0xFFFFFFFF, np.uint32), z, z, z)
    s0 = []
    defaults = (0, 0xFFFFFFFF, 0, 0, 0)
    for k, st in enumerate(state0):
        p = np.full(Bp, defaults[k], np.uint32)
        p[:B] = np.asarray(st, np.uint32)
        s0.append(jnp.asarray(p.reshape(R, LANES).view(np.int32)))

    outs = _rc_call(jnp.asarray(P0), jnp.asarray(P1), s0, T=Tp,
                    interpret=interpret)
    statef = tuple(np.asarray(x).view(np.uint32).reshape(Bp)[:B]
                   for x in outs[4:])
    return outs, statef, B, T, Tp, Bp


def encode_walk(cum, freq, tot, active=None, state0=None,
                interpret: bool = False):
    """Drop-in Pallas analog of rc_jax.encode_scan: same inputs
    ((B, T) u32 arrays, optional (B, T) active, optional carried
    state), same returns (final state 5-tuple of (B,) u32 arrays and
    (flush, cache, ff, carry) event arrays of shape (B, T, 2)).

    Event `carry` is reported mod 256 — the only bits that reach
    output bytes (assemble_stream masks with & 0xFF); the carried
    state keeps full width."""
    outs, statef, B, T, Tp, Bp = _walk_planes(cum, freq, tot, active,
                                              state0, interpret)
    ff0, ev0, ff1, ev1 = [np.asarray(x) for x in outs[:4]]

    def unstack(p):  # (Tp, R, 128) -> (B, T)
        return p.transpose(1, 2, 0).reshape(Bp, Tp)[:B, :T]

    e0, e1 = unstack(ev0), unstack(ev1)
    fl = np.stack([(e0 >> 16) & 1, (e1 >> 16) & 1], axis=-1).astype(bool)
    ca = np.stack([e0 & 0xFF, e1 & 0xFF], axis=-1).astype(np.uint32)
    cy = np.stack([(e0 >> 8) & 0xFF, (e1 >> 8) & 0xFF],
                  axis=-1).astype(np.uint32)
    ff = np.ascontiguousarray(
        np.stack([unstack(ff0), unstack(ff1)], axis=-1)).view(np.uint32)
    return tuple(statef), (fl, ca, ff, cy)
