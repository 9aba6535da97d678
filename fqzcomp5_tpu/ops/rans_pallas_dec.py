"""Pallas TPU kernel for the batched 32-lane rANS order-0 decode walk.

TPUs have no vector gather, which rules out the CPU recipe (s3-LUT
gathers, rANS_static32x16pr_avx2.c:527-607).  This kernel replaces the
two gathers differently:

- symbol lookup: a compare-reduction over the cumulative-frequency
  boundaries — sym = #{j : C[j+1] <= m} — with freq/start selected in
  the same pass.  Cost is O(alphabet) VPU ops per step, so the kernel
  is compiled per alphabet bucket (16/64/256).
- word feed: each stream keeps a 256-word register double-window
  (two (rows,128) int32 tiles).  Per step, lanes take the next 0..32
  words via a rank (segmented prefix sum over the 32 state lanes,
  log-step rolls) and a 32-way select from the cons-aligned view; the
  window then advances by the consumed count with masked static rolls.
  When 128 words are consumed the windows swap and the refill DMAs in
  per-row from HBM (the words array never stages through VMEM blocks,
  so section size is unbounded).

Layout: one stream per row; lanes 0..31 hold the 32 interleaved rANS
states (rANS_static32x16pr.c:65).  T leads arrays so per-step dynamic
indices land on untiled dims.
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
LANES = 128
WIN = 128            # words per window tile


def build_dec_tables(freqs: np.ndarray, shift: int, S: int) -> np.ndarray:
    """(B, S) int32 boundary/freq tables: entry j packs
    (freq[j+1] << 14) | C[j+1]; entry S-1 has C[S]=1<<shift so its
    compare never fires.  freqs: (B, 256) summing to 1<<shift; all
    symbols above S-1 must be absent."""
    freqs = np.atleast_2d(freqs).astype(np.int64)
    B = freqs.shape[0]
    if S < 256:
        assert (freqs[:, S:] == 0).all(), "alphabet exceeds bucket"
    C = np.zeros((B, 257), np.int64)
    C[:, 1:] = np.cumsum(freqs, axis=1)
    f_next = np.zeros((B, 256), np.int64)
    f_next[:, :255] = freqs[:, 1:]
    out = ((f_next[:, :S] << 14) | C[:, 1:S + 1]).astype(np.int32)
    return out


def build_dec_tables_p(freqs: np.ndarray, shift: int,
                       S: int) -> np.ndarray:
    """Packed v3 tables: entry j = ((j+1) << 26) | (freq[j+1] << 13) |
    C[j+1], so the compare loop needs only 3 ops per boundary (the
    decoded symbol rides the entry instead of a separate counter).
    Valid for S <= 64 and shift <= 12 (13-bit fields).  The selected
    entry (last j with C[j+1] <= m) decodes symbol s* = j+1 <= S-1, so
    6 bits suffice; entries whose boundary equals 1<<shift can never
    be selected (m < 1<<shift), so j = S-1's wrapped tag is harmless."""
    assert S <= 64 and shift <= 12
    freqs = np.atleast_2d(freqs).astype(np.int64)
    assert (freqs[:, S:] == 0).all(), "alphabet exceeds bucket"
    B = freqs.shape[0]
    C = np.zeros((B, 257), np.int64)
    C[:, 1:] = np.cumsum(freqs, axis=1)
    f_next = np.zeros((B, 256), np.int64)
    f_next[:, :255] = freqs[:, 1:]
    j = np.arange(S, dtype=np.int64)
    out = ((((j[None, :] + 1) & 63) << 26) | (f_next[:, :S] << 13)
           | C[:, 1:S + 1]).astype(np.int64)
    return (out & 0xFFFFFFFF).astype(np.uint32).view(np.int32)


def _lane_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)


def _decode_kernel(shift: int, Tc: int, S: int, tab_ref, f0_ref, r0_ref,
                   w_hbm, treal_ref, sym_ref, rf_ref,
                   R_st, W0, W1, cons_st, jhbm_st, sem):
    """Grid: (stream-row blocks, T chunks).  State persists over T."""
    t_idx = pl.program_id(1)
    b_idx = pl.program_id(0)
    rows = R_st.shape[0]
    lane = _lane_iota()
    in_seg = lane < N
    mask = (1 << shift) - 1

    @pl.when(t_idx == 0)
    def _():
        R_st[:] = r0_ref[:]
        for r in range(rows):
            cons_st[r] = 0
            jhbm_st[r] = 2
            # preload both windows synchronously (w_hbm is the whole
            # unblocked array: row index is global)
            for slot, Wd in ((0, W0), (1, W1)):
                dma = pltpu.make_async_copy(
                    w_hbm.at[b_idx * rows + r, slot], Wd.at[r],
                    sem.at[r])
                dma.start()
                dma.wait()

    def step(s, _):
        t_global = t_idx * Tc + s
        R = R_st[:]
        m = R & mask

        # ---- symbol lookup: sym = #{j : C[j+1] <= m} ---------------
        sym = jnp.zeros((rows, LANES), jnp.int32)
        F = f0_ref[:]                     # freq of symbol 0, broadcast
        C = jnp.zeros((rows, LANES), jnp.int32)
        for j in range(S):
            e = tab_ref[:, j:j + 1]       # (rows, 1) broadcast
            cj = e & 0x3FFF
            ge = m >= cj
            sym = sym + ge.astype(jnp.int32)
            F = jnp.where(ge, e >> 14, F)
            C = jnp.where(ge, cj, C)

        Rn = F * jax.lax.shift_right_logical(R, shift) + (m - C)

        # ---- renormalisation ranks ---------------------------------
        treal_vec = jnp.array([treal_ref[r, 0] for r in range(rows)],
                              jnp.int32).reshape(rows, 1)
        active = (t_global < treal_vec).astype(jnp.int32)
        need = ((Rn < RANS_L) & in_seg).astype(jnp.int32) * active
        incl = need
        for d in (1, 2, 4, 8, 16):
            sh = pltpu.roll(incl, d, axis=1)
            incl = incl + jnp.where(lane >= d, sh, 0)
        rank = incl - need
        k = incl[:, N - 1:N]              # (rows, 1) consumed count

        # ---- word select from the cons-aligned window --------------
        cons_vec = cons_ref_vec(cons_st, rows)
        # V[j] = window[cons + j]; build by shifting W0||W1 left by cons
        V0, V1 = W0[:], W1[:]
        for d in (1, 2, 4, 8, 16, 32, 64):
            bit = (cons_vec & d) > 0
            r0 = pltpu.roll(V0, LANES - d, axis=1)  # left-shift by d
            r1 = pltpu.roll(V1, LANES - d, axis=1)
            # lanes >= 128-d of roll(V0) wrapped from the front; they
            # must come from V1's first d lanes (which r1 holds there)
            m0 = jnp.where(lane < LANES - d, r0, r1)
            V0 = jnp.where(bit, m0, V0)
            V1 = jnp.where(bit, r1, V1)
        word = jnp.zeros((rows, LANES), jnp.int32)
        for j in range(N):
            word = jnp.where((rank == j) & (need > 0), V0[:, j:j + 1],
                             word)

        Rn = jnp.where(need > 0, (Rn << 16) | (word & 0xFFFF), Rn)
        R_new = jnp.where((active > 0) & in_seg, Rn, R)
        R_st[:] = R_new
        sym_ref[s] = jnp.where(active > 0, sym, 0)

        # ---- advance window ----------------------------------------
        for r in range(rows):
            kk = k[r, 0]
            new_cons = cons_st[r] + kk

            @pl.when(new_cons >= WIN)
            def _(r=r, new_cons=new_cons):
                W0[r, :] = W1[r, :]
                dma = pltpu.make_async_copy(
                    w_hbm.at[b_idx * rows + r, jhbm_st[r]], W1.at[r],
                    sem.at[r])
                dma.start()
                dma.wait()
                jhbm_st[r] = jhbm_st[r] + 1
                cons_st[r] = new_cons - WIN

            @pl.when(new_cons < WIN)
            def _(r=r, new_cons=new_cons):
                cons_st[r] = new_cons

        return 0

    jax.lax.fori_loop(0, Tc, step, 0)

    n_t = pl.num_programs(1)

    @pl.when(t_idx == n_t - 1)
    def _():
        rf_ref[:] = R_st[:]
        # stash the per-row word cursor in lane 32 (the host continues
        # the <32-byte tail from there)
        cur = jnp.array([(jhbm_st[r] - 2) * WIN + cons_st[r]
                         for r in range(rows)], jnp.int32).reshape(rows, 1)
        rf_ref[:, N:N + 1] = cur


def cons_ref_vec(cons_st, rows):
    """(rows, 1) int32 vector of the per-row consumed counts."""
    vals = [cons_st[r] for r in range(rows)]
    return jnp.array(vals, jnp.int32).reshape(rows, 1)


@functools.partial(jax.jit, static_argnames=("shift", "S", "T",
                                             "interpret"))
def decode_walk(words128, tab, f0, R0, treal, T: int, shift: int = 12,
                S: int = 256, interpret: bool = False):
    """words128: (B, W128, 128) int32 word stream per stream (padded);
    tab: (B, S) int32 from build_dec_tables; f0: (B, 1) freq of symbol
    0; R0: (B, 128) int32 initial states (lanes 0..31); treal: (B,)
    active step counts (reshaped to (B,1) SMEM internally).
    Returns (syms (T, B, 128) int32, Rf)."""
    B, W128, L = words128.shape
    assert L == LANES and W128 >= 2
    rows = min(B, 8)
    while B % rows:
        rows -= 1
    Tc = max(1, min(T, 128))
    while T % Tc:
        Tc -= 1
    grid = (B // rows, T // Tc)
    nt = grid[1]

    del nt
    out_spec = pl.BlockSpec((Tc, rows, LANES),
                            lambda b, t: (t, b, 0),
                            memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((rows, LANES), lambda b, t: (b, 0),
                              memory_space=pltpu.VMEM)

    syms, Rf = pl.pallas_call(
        functools.partial(_decode_kernel, shift, Tc, S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, S), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            state_spec,
            pl.BlockSpec(memory_space=pl.ANY),   # words in HBM
            pl.BlockSpec((rows, 1), lambda b, t: (b, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[out_spec, state_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.int32),   # R
            pltpu.VMEM((rows, LANES), jnp.int32),   # W0
            pltpu.VMEM((rows, LANES), jnp.int32),   # W1
            pltpu.SMEM((rows,), jnp.int32),          # cons
            pltpu.SMEM((rows,), jnp.int32),          # next hbm chunk
            pltpu.SemaphoreType.DMA((rows,)),
        ],
        interpret=interpret,
    )(tab, f0, R0, words128, treal.reshape(B, 1).astype(jnp.int32))
    return syms, Rf


# ---------------------------------------------------------------------
# v2: 4 streams per 128-lane row (full VPU utilisation).
#
# Tables expand per lane ((S, rows, 128) — each lane reads its own
# stream's entry), the rank prefix-sum masks at 32-lane segment
# boundaries, and each stream slot keeps its own register double-window
# with per-(row,slot) consumption counters.

S_SLOTS = 4


def _decode_kernel4(shift: int, Tc: int, S: int, cexp_ref, f0_ref, r0_ref,
                    w_hbm, texp_ref, sym_ref, rf_ref,
                    R_st, W0a, W0b, W0c, W0d, W1a, W1b, W1c, W1d,
                    cons_st, jhbm_st, sem):
    t_idx = pl.program_id(1)
    b_idx = pl.program_id(0)
    rows = R_st.shape[0]
    lane = _lane_iota()
    lane_mod = lane & (N - 1)
    mask = (1 << shift) - 1
    W0s = (W0a, W0b, W0c, W0d)
    W1s = (W1a, W1b, W1c, W1d)

    @pl.when(t_idx == 0)
    def _():
        R_st[:] = r0_ref[:]
        for r in range(rows):
            for s in range(S_SLOTS):
                cons_st[r, s] = 0
                jhbm_st[r, s] = 2
                g = (b_idx * rows + r) * S_SLOTS + s
                for slot, Wd in ((0, W0s[s]), (1, W1s[s])):
                    dma = pltpu.make_async_copy(
                        w_hbm.at[g, slot], Wd.at[r], sem.at[r])
                    dma.start()
                    dma.wait()

    def step(st, _):
        t_global = t_idx * Tc + st
        R = R_st[:]
        m = R & mask

        sym = jnp.zeros((rows, LANES), jnp.int32)
        F = f0_ref[:]
        C = jnp.zeros((rows, LANES), jnp.int32)
        for j in range(S):
            e = cexp_ref[j]               # (rows, 128): per-lane entry
            cj = e & 0x3FFF
            ge = m >= cj
            sym = sym + ge.astype(jnp.int32)
            F = jnp.where(ge, e >> 14, F)
            C = jnp.where(ge, cj, C)

        Rn = F * jax.lax.shift_right_logical(R, shift) + (m - C)

        active = (t_global < texp_ref[:]).astype(jnp.int32)
        need = (Rn < RANS_L).astype(jnp.int32) * active
        incl = need
        for d in (1, 2, 4, 8, 16):
            sh = pltpu.roll(incl, d, axis=1)
            incl = incl + jnp.where(lane_mod >= d, sh, 0)
        rank = incl - need

        word = jnp.zeros((rows, LANES), jnp.int32)
        for s in range(S_SLOTS):
            in_slot = (lane >= s * N) & (lane < (s + 1) * N)
            cons_vec = jnp.array(
                [cons_st[r, s] for r in range(rows)],
                jnp.int32).reshape(rows, 1)
            V0, V1 = W0s[s][:], W1s[s][:]
            for d in (1, 2, 4, 8, 16, 32, 64):
                bit = (cons_vec & d) > 0
                r0 = pltpu.roll(V0, LANES - d, axis=1)
                r1 = pltpu.roll(V1, LANES - d, axis=1)
                m0 = jnp.where(lane < LANES - d, r0, r1)
                V0 = jnp.where(bit, m0, V0)
                V1 = jnp.where(bit, r1, V1)
            sel = (need > 0) & in_slot
            for j in range(N):
                word = jnp.where(sel & (rank == j), V0[:, j:j + 1], word)

        Rn = jnp.where(need > 0, (Rn << 16) | (word & 0xFFFF), Rn)
        R_st[:] = jnp.where(active > 0, Rn, R)
        sym_ref[st] = jnp.where(active > 0, sym, 0)

        for s in range(S_SLOTS):
            kseg = incl[:, (s + 1) * N - 1:(s + 1) * N]
            for r in range(rows):
                new_cons = cons_st[r, s] + kseg[r, 0]

                @pl.when(new_cons >= WIN)
                def _(r=r, s=s, new_cons=new_cons):
                    W0s[s][r, :] = W1s[s][r, :]
                    g = (b_idx * rows + r) * S_SLOTS + s
                    dma = pltpu.make_async_copy(
                        w_hbm.at[g, jhbm_st[r, s]], W1s[s].at[r],
                        sem.at[r])
                    dma.start()
                    dma.wait()
                    jhbm_st[r, s] = jhbm_st[r, s] + 1
                    cons_st[r, s] = new_cons - WIN

                @pl.when(new_cons < WIN)
                def _(r=r, s=s, new_cons=new_cons):
                    cons_st[r, s] = new_cons

        return 0

    jax.lax.fori_loop(0, Tc, step, 0)

    n_t = pl.num_programs(1)

    @pl.when(t_idx == n_t - 1)
    def _():
        rf_ref[:] = R_st[:]


@functools.partial(jax.jit, static_argnames=("shift", "S", "T",
                                             "interpret"))
def decode_walk4(words128, cexp, f0exp, R0p, texp, T: int,
                 shift: int = 12, S: int = 256, interpret: bool = False):
    """4-streams-per-row decode walk.

    words128: (B, W128, 128) int32 per-stream word chunks (B = total
    streams, a multiple of 4); cexp: (S, B4, 128) per-lane tables;
    f0exp/texp/R0p: (B4, 128) per-lane symbol-0 freqs / active step
    counts / initial states.  Returns (syms (T, B4, 128), Rf)."""
    B, W128, L = words128.shape
    B4 = B // S_SLOTS
    assert B4 * S_SLOTS == B and L == LANES
    rows = min(B4, 8)
    while B4 % rows:
        rows -= 1
    Tc = max(1, min(T, 128))
    while T % Tc:
        Tc -= 1
    grid = (B4 // rows, T // Tc)

    state_spec = pl.BlockSpec((rows, LANES), lambda b, t: (b, 0),
                              memory_space=pltpu.VMEM)
    syms, Rf = pl.pallas_call(
        functools.partial(_decode_kernel4, shift, Tc, S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, rows, LANES), lambda b, t: (0, b, 0),
                         memory_space=pltpu.VMEM),
            state_spec,
            state_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            state_spec,
        ],
        out_specs=[
            pl.BlockSpec((Tc, rows, LANES), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            state_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B4, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B4, LANES), jnp.int32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((rows, LANES), jnp.int32) for _ in range(9)]
            + [pltpu.SMEM((rows, S_SLOTS), jnp.int32),
               pltpu.SMEM((rows, S_SLOTS), jnp.int32),
               pltpu.SemaphoreType.DMA((rows,))]),
        interpret=interpret,
    )(cexp, f0exp, R0p, words128, texp)
    return syms, Rf


def expand4(per_stream: np.ndarray) -> np.ndarray:
    """(B, ...) per-stream values -> per-lane (B//4, ..., 128) with
    stream b in lanes (b%4)*32:(b%4+1)*32 of row b//4."""
    B = per_stream.shape[0]
    assert B % S_SLOTS == 0
    rest = per_stream.shape[1:]
    x = per_stream.reshape((B // S_SLOTS, S_SLOTS) + rest + (1,))
    x = np.broadcast_to(x, (B // S_SLOTS, S_SLOTS) + rest + (N,))
    # -> (B4, ..., 4, 32) -> (B4, ..., 128)
    x = np.moveaxis(x, 1, -2)
    return np.ascontiguousarray(
        x.reshape((B // S_SLOTS,) + rest + (LANES,)))


# ---------------------------------------------------------------------
# v3: fully vectorised bookkeeping.
#
# Beyond v2: the consumption counter lives as a (rows,128) VMEM tile
# (replicated per 32-lane segment) so window alignment masks come from
# vector bits; the rank select collapses to a per-lane-bit
# segment-local shift (5 masked double-rolls instead of a 32-way
# scan); the S-loop keeps the packed entry and unpacks once.  Scalar
# work remains only in the (gated) refill branches.

def _seg_broadcast_last(x, lane_mod):
    """Broadcast each 32-lane segment's lane-31 value to the segment."""
    b = x
    for d in (1, 2, 4, 8, 16):
        sh = pltpu.roll(b, LANES - d, axis=1)  # left-shift by d
        b = jnp.maximum(b, jnp.where(lane_mod < N - d, sh, b))
    return b


def _decode_kernel4v3(shift: int, Tc: int, S: int, cexp_ref, f0_ref,
                      r0_ref, w_hbm, texp_ref, sym_ref, rf_ref,
                      R_st, W0a, W0b, W0c, W0d, W1a, W1b, W1c, W1d,
                      W2a, W2b, W2c, W2d, cons_t, jhbm_st, sem):
    t_idx = pl.program_id(1)
    b_idx = pl.program_id(0)
    rows = R_st.shape[0]
    lane = _lane_iota()
    lane_mod = lane & (N - 1)
    seg = lane >> 5
    mask = (1 << shift) - 1
    W0s = (W0a, W0b, W0c, W0d)
    W1s = (W1a, W1b, W1c, W1d)
    W2s = (W2a, W2b, W2c, W2d)

    @pl.when(t_idx == 0)
    def _():
        R_st[:] = r0_ref[:]
        cons_t[:] = jnp.zeros((rows, LANES), jnp.int32)
        for r in range(rows):
            for s in range(S_SLOTS):
                jhbm_st[r, s] = 3
                g = (b_idx * rows + r) * S_SLOTS + s
                for slot, Wd in ((0, W0s[s]), (1, W1s[s])):
                    dma = pltpu.make_async_copy(
                        w_hbm.at[g, slot], Wd.at[r], sem.at[r, s])
                    dma.start()
                    dma.wait()
                # W2 prefetch stays in flight; waited at first crossing
                pltpu.make_async_copy(
                    w_hbm.at[g, 2], W2s[s].at[r], sem.at[r, s]).start()

    def step(st, _):
        t_global = t_idx * Tc + st
        R = R_st[:]
        m = R & mask

        if S <= 64:
            # packed entries (build_dec_tables_p): the decoded symbol
            # rides the selected entry — 3 ops per boundary
            P = (f0_ref[:] << 13)
            for j in range(S):
                e = cexp_ref[j]
                ge = m >= (e & 0x1FFF)
                P = jnp.where(ge, e, P)
            sym = jax.lax.shift_right_logical(P, 26)
            F = (P >> 13) & 0x1FFF
            C = P & 0x1FFF
        else:
            # 256-symbol bucket: (f<<14|c) tables + explicit counter
            sym = jnp.zeros((rows, LANES), jnp.int32)
            P = (f0_ref[:] << 14)
            for j in range(S):
                e = cexp_ref[j]
                ge = m >= (e & 0x3FFF)
                sym = sym + ge.astype(jnp.int32)
                P = jnp.where(ge, e, P)
            F = P >> 14
            C = jnp.where(sym > 0, P & 0x3FFF, 0)

        Rn = F * jax.lax.shift_right_logical(R, shift) + (m - C)

        active = (t_global < texp_ref[:]).astype(jnp.int32)
        need = (Rn < RANS_L).astype(jnp.int32) * active
        incl = need
        for d in (1, 2, 4, 8, 16):
            sh = pltpu.roll(incl, d, axis=1)
            incl = incl + jnp.where(lane_mod >= d, sh, 0)
        rank = incl - need
        kseg = _seg_broadcast_last(incl, lane_mod)

        cons = cons_t[:]
        # combined first-32 window view per slot, aligned by cons.
        # Slot operations interleave inside each shift step so the
        # long roll->select chains of the four slots overlap (the VPU
        # is latency-bound here, not issue-bound).
        css = [jnp.where(seg == s, cons, 0) for s in range(S_SLOTS)]
        for d in (1, 2, 4, 8, 16, 32, 64):
            css = [jnp.maximum(cs, pltpu.roll(cs, d, axis=1))
                   for cs in css]
        V0s = [W0s[s][:] for s in range(S_SLOTS)]
        V1s = [W1s[s][:] for s in range(S_SLOTS)]
        for d in (1, 2, 4, 8, 16, 32, 64):
            bs = [(css[s] & d) > 0 for s in range(S_SLOTS)]
            r0s = [pltpu.roll(v, LANES - d, axis=1) for v in V0s]
            r1s = [pltpu.roll(v, LANES - d, axis=1) for v in V1s]
            m0s = [jnp.where(lane < LANES - d, r0s[s], r1s[s])
                   for s in range(S_SLOTS)]
            V0s = [jnp.where(bs[s], m0s[s], V0s[s])
                   for s in range(S_SLOTS)]
            V1s = [jnp.where(bs[s], r1s[s], V1s[s])
                   for s in range(S_SLOTS)]
        Vc = jnp.zeros((rows, LANES), jnp.int32)
        for s in range(S_SLOTS):
            Vc = jnp.where(seg == s, pltpu.roll(V0s[s], s * N, axis=1),
                           Vc)

        # word = Vc[32*seg + rank]: stable expand of the compacted
        # window values.  rank is monotone within a segment, so the
        # butterfly composes when bits of (lane - rank) process high
        # to low with right-shifts (verified exhaustively).
        delta = lane_mod - rank
        w = Vc
        for d in (16, 8, 4, 2, 1):
            sh = pltpu.roll(w, d, axis=1)           # lane z <- w[z-d]
            wrap = pltpu.roll(w, 96 + d, axis=1)    # segment wrap
            shifted = jnp.where(lane_mod >= d, sh, wrap)
            w = jnp.where((delta & d) > 0, shifted, w)

        Rn = jnp.where(need > 0, (Rn << 16) | (w & 0xFFFF), Rn)
        R_st[:] = jnp.where(active > 0, Rn, R)
        sym_ref[st] = jnp.where(active > 0, sym, 0)

        new_cons = cons + kseg
        crossing = (new_cons >= WIN).astype(jnp.int32)
        cons_t[:] = jnp.where(crossing > 0, new_cons - WIN, new_cons)
        # per-slot scalar bitmasks of crossing rows (bit r of bits[s])
        # per-slot crossing bitmasks SPLIT into lo (rows 0-31) and
        # hi (rows 32-63) words: TPU int32 shifts alias mod 32, so a
        # single 1<<row mask silently corrupts kernels with rows > 32
        # (found by a hardware roundtrip at the rows=64 default)
        row_id = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        pow_lo = jnp.where(row_id < 32, jnp.int32(1) << row_id, 0)
        pow_hi = jnp.where(row_id >= 32,
                           jnp.int32(1) << (row_id - 32), 0)
        bits = [jnp.sum(jnp.where((lane == s * N),
                                  crossing * pow_lo, 0))
                for s in range(S_SLOTS)]
        bits_hi = [jnp.sum(jnp.where((lane == s * N),
                                     crossing * pow_hi, 0))
                   for s in range(S_SLOTS)]
        any_cross = bits[0] | bits[1] | bits[2] | bits[3] \
            | bits_hi[0] | bits_hi[1] | bits_hi[2] | bits_hi[3]

        @pl.when(any_cross != 0)
        def _():
            # rotate the triple window: the W2 prefetch (started a full
            # 128-word period ago) has already landed, so the wait is
            # free; then relaunch the prefetch for the next chunk
            for s in range(S_SLOTS):
                for r in range(rows):
                    word_rs = bits[s] if r < 32 else bits_hi[s]

                    @pl.when(((word_rs >> (r & 31)) & 1) > 0)
                    def _(r=r, s=s):
                        g = (b_idx * rows + r) * S_SLOTS + s
                        pltpu.make_async_copy(
                            w_hbm.at[g, jhbm_st[r, s] - 1],
                            W2s[s].at[r], sem.at[r, s]).wait()
                        W0s[s][r, :] = W1s[s][r, :]
                        W1s[s][r, :] = W2s[s][r, :]
                        pltpu.make_async_copy(
                            w_hbm.at[g, jhbm_st[r, s]], W2s[s].at[r],
                            sem.at[r, s]).start()
                        jhbm_st[r, s] = jhbm_st[r, s] + 1

        return 0

    jax.lax.fori_loop(0, Tc, step, 0)

    n_t = pl.num_programs(1)

    @pl.when(t_idx == n_t - 1)
    def _():
        rf_ref[:] = R_st[:]
        # drain the always-in-flight W2 prefetches before kernel exit
        for s in range(S_SLOTS):
            for r in range(rows):
                g = (b_idx * rows + r) * S_SLOTS + s
                pltpu.make_async_copy(
                    w_hbm.at[g, jhbm_st[r, s] - 1], W2s[s].at[r],
                    sem.at[r, s]).wait()


@functools.partial(jax.jit, static_argnames=("shift", "S", "T",
                                             "interpret", "rows_cap"))
def decode_walk4v3(words128, cexp, f0exp, R0p, texp, T: int,
                   shift: int = 12, S: int = 256,
                   interpret: bool = False, rows_cap: int = 64):
    """v3 of decode_walk4 (same signature/results).  rows_cap sets the
    stream-rows per grid cell: the walk is per-step fixed-cost bound
    (v4 experiment), so more rows per step amortise better until tile
    op cost takes over."""
    B, W128, L = words128.shape
    B4 = B // S_SLOTS
    assert B4 * S_SLOTS == B and L == LANES
    rows = min(B4, rows_cap)
    while B4 % rows:
        rows -= 1
    Tc = max(1, min(T, 128))
    while T % Tc:
        Tc -= 1
    grid = (B4 // rows, T // Tc)

    state_spec = pl.BlockSpec((rows, LANES), lambda b, t: (b, 0),
                              memory_space=pltpu.VMEM)
    syms, Rf = pl.pallas_call(
        functools.partial(_decode_kernel4v3, shift, Tc, S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, rows, LANES), lambda b, t: (0, b, 0),
                         memory_space=pltpu.VMEM),
            state_spec,
            state_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            state_spec,
        ],
        out_specs=[
            pl.BlockSpec((Tc, rows, LANES), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            state_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B4, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B4, LANES), jnp.int32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((rows, LANES), jnp.int32) for _ in range(14)]
            + [pltpu.SMEM((rows, S_SLOTS), jnp.int32),
               pltpu.SemaphoreType.DMA((rows, S_SLOTS))]),
        interpret=interpret,
    )(cexp, f0exp, R0p, words128, texp)
    return syms, Rf


# ---------------------------------------------------------------------
# Order-1 decode: same walk and word feed as v3, but the boundary
# table row depends on each lane's previous decoded symbol.  Symbols
# and contexts remap to a dense alphabet (A values) on the host, so
# the lookup is an outer loop over contexts (mask last==c) around the
# O0-style compare loop — O(A^2) VPU ops per step.  Decoded dense
# indices map back to bytes on the host.

def _decode_kernel4v3_o1(shift: int, Tc: int, A: int, A1: int, last0: int,
                         cexp_ref, r0_ref, w_hbm, texp_ref,
                         sym_ref, rf_ref, cur_ref,
                         R_st, last_st, W0a, W0b, W0c, W0d,
                         W1a, W1b, W1c, W1d, W2a, W2b, W2c, W2d,
                         cons_t, jhbm_st, sem):
    """cexp layout: row c*(A+1) is context c's symbol-0 packed entry
    ((f0<<14), C=0); rows c*(A+1)+1+j are boundary entries j (packed
    (f[j+1]<<14)|C[j+1])."""
    t_idx = pl.program_id(1)
    b_idx = pl.program_id(0)
    rows = R_st.shape[0]
    lane = _lane_iota()
    lane_mod = lane & (N - 1)
    seg = lane >> 5
    mask = (1 << shift) - 1
    W0s = (W0a, W0b, W0c, W0d)
    W1s = (W1a, W1b, W1c, W1d)
    W2s = (W2a, W2b, W2c, W2d)
    stride = A + 1

    @pl.when(t_idx == 0)
    def _():
        R_st[:] = r0_ref[:]
        last_st[:] = jnp.full((rows, LANES), last0, jnp.int32)
        cons_t[:] = jnp.zeros((rows, LANES), jnp.int32)
        for r in range(rows):
            for s in range(S_SLOTS):
                jhbm_st[r, s] = 3
                g = (b_idx * rows + r) * S_SLOTS + s
                for slot, Wd in ((0, W0s[s]), (1, W1s[s])):
                    dma = pltpu.make_async_copy(
                        w_hbm.at[g, slot], Wd.at[r], sem.at[r, s])
                    dma.start()
                    dma.wait()
                pltpu.make_async_copy(
                    w_hbm.at[g, 2], W2s[s].at[r], sem.at[r, s]).start()

    def step(st, _):
        t_global = t_idx * Tc + st
        R = R_st[:]
        last = last_st[:]
        m = R & mask

        if A <= 64:
            # packed entries (build_o1_dense_tables): 3 ops/boundary,
            # the decoded symbol rides the selected entry
            P = jnp.zeros((rows, LANES), jnp.int32)
            for c in range(A1):
                onc = last == c
                Pc = cexp_ref[c * stride]
                for j in range(A):
                    e = cexp_ref[c * stride + 1 + j]
                    ge = m >= (e & 0x1FFF)
                    Pc = jnp.where(ge, e, Pc)
                P = jnp.where(onc, Pc, P)
            sym = jax.lax.shift_right_logical(P, 26)
            F = (P >> 13) & 0x1FFF
            C = P & 0x1FFF
        else:
            sym = jnp.zeros((rows, LANES), jnp.int32)
            P = jnp.zeros((rows, LANES), jnp.int32)
            for c in range(A1):
                onc = last == c
                Pc = cexp_ref[c * stride]
                symc = jnp.zeros((rows, LANES), jnp.int32)
                for j in range(A):
                    e = cexp_ref[c * stride + 1 + j]
                    ge = m >= (e & 0x3FFF)
                    symc = symc + ge.astype(jnp.int32)
                    Pc = jnp.where(ge, e, Pc)
                sym = jnp.where(onc, symc, sym)
                P = jnp.where(onc, Pc, P)
            F = P >> 14
            C = jnp.where(sym > 0, P & 0x3FFF, 0)

        Rn = F * jax.lax.shift_right_logical(R, shift) + (m - C)

        active = (t_global < texp_ref[:]).astype(jnp.int32)
        need = (Rn < RANS_L).astype(jnp.int32) * active
        incl = need
        for d in (1, 2, 4, 8, 16):
            sh = pltpu.roll(incl, d, axis=1)
            incl = incl + jnp.where(lane_mod >= d, sh, 0)
        rank = incl - need
        kseg = _seg_broadcast_last(incl, lane_mod)

        cons = cons_t[:]
        css = [jnp.where(seg == s, cons, 0) for s in range(S_SLOTS)]
        for d in (1, 2, 4, 8, 16, 32, 64):
            css = [jnp.maximum(cs, pltpu.roll(cs, d, axis=1))
                   for cs in css]
        V0s = [W0s[s][:] for s in range(S_SLOTS)]
        V1s = [W1s[s][:] for s in range(S_SLOTS)]
        for d in (1, 2, 4, 8, 16, 32, 64):
            bs = [(css[s] & d) > 0 for s in range(S_SLOTS)]
            r0s = [pltpu.roll(v, LANES - d, axis=1) for v in V0s]
            r1s = [pltpu.roll(v, LANES - d, axis=1) for v in V1s]
            m0s = [jnp.where(lane < LANES - d, r0s[s], r1s[s])
                   for s in range(S_SLOTS)]
            V0s = [jnp.where(bs[s], m0s[s], V0s[s])
                   for s in range(S_SLOTS)]
            V1s = [jnp.where(bs[s], r1s[s], V1s[s])
                   for s in range(S_SLOTS)]
        Vc = jnp.zeros((rows, LANES), jnp.int32)
        for s in range(S_SLOTS):
            Vc = jnp.where(seg == s, pltpu.roll(V0s[s], s * N, axis=1),
                           Vc)

        delta = lane_mod - rank
        w = Vc
        for d in (16, 8, 4, 2, 1):
            sh = pltpu.roll(w, d, axis=1)
            wrap = pltpu.roll(w, 96 + d, axis=1)
            shifted = jnp.where(lane_mod >= d, sh, wrap)
            w = jnp.where((delta & d) > 0, shifted, w)

        Rn = jnp.where(need > 0, (Rn << 16) | (w & 0xFFFF), Rn)
        R_st[:] = jnp.where(active > 0, Rn, R)
        last_st[:] = jnp.where(active > 0, sym, last)
        sym_ref[st] = jnp.where(active > 0, sym, 0)

        new_cons = cons + kseg
        crossing = (new_cons >= WIN).astype(jnp.int32)
        cons_t[:] = jnp.where(crossing > 0, new_cons - WIN, new_cons)
        # per-slot crossing bitmasks SPLIT into lo (rows 0-31) and
        # hi (rows 32-63) words: TPU int32 shifts alias mod 32, so a
        # single 1<<row mask silently corrupts kernels with rows > 32
        # (found by a hardware roundtrip at the rows=64 default)
        row_id = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        pow_lo = jnp.where(row_id < 32, jnp.int32(1) << row_id, 0)
        pow_hi = jnp.where(row_id >= 32,
                           jnp.int32(1) << (row_id - 32), 0)
        bits = [jnp.sum(jnp.where((lane == s * N),
                                  crossing * pow_lo, 0))
                for s in range(S_SLOTS)]
        bits_hi = [jnp.sum(jnp.where((lane == s * N),
                                     crossing * pow_hi, 0))
                   for s in range(S_SLOTS)]
        any_cross = bits[0] | bits[1] | bits[2] | bits[3] \
            | bits_hi[0] | bits_hi[1] | bits_hi[2] | bits_hi[3]

        @pl.when(any_cross != 0)
        def _():
            for s in range(S_SLOTS):
                for r in range(rows):
                    word_rs = bits[s] if r < 32 else bits_hi[s]

                    @pl.when(((word_rs >> (r & 31)) & 1) > 0)
                    def _(r=r, s=s):
                        g = (b_idx * rows + r) * S_SLOTS + s
                        pltpu.make_async_copy(
                            w_hbm.at[g, jhbm_st[r, s] - 1],
                            W2s[s].at[r], sem.at[r, s]).wait()
                        W0s[s][r, :] = W1s[s][r, :]
                        W1s[s][r, :] = W2s[s][r, :]
                        pltpu.make_async_copy(
                            w_hbm.at[g, jhbm_st[r, s]], W2s[s].at[r],
                            sem.at[r, s]).start()
                        jhbm_st[r, s] = jhbm_st[r, s] + 1

        return 0

    jax.lax.fori_loop(0, Tc, step, 0)

    n_t = pl.num_programs(1)

    @pl.when(t_idx == n_t - 1)
    def _():
        rf_ref[:] = R_st[:]
        # per-stream word cursors, replicated over each segment
        jexp = jnp.zeros((rows, LANES), jnp.int32)
        for s in range(S_SLOTS):
            jcol = jnp.array([jhbm_st[r, s] for r in range(rows)],
                             jnp.int32).reshape(rows, 1)
            jexp = jnp.where(seg == s, jcol, jexp)
        cur_ref[:] = (jexp - 3) * WIN + cons_t[:]
        for s in range(S_SLOTS):
            for r in range(rows):
                g = (b_idx * rows + r) * S_SLOTS + s
                pltpu.make_async_copy(
                    w_hbm.at[g, jhbm_st[r, s] - 1], W2s[s].at[r],
                    sem.at[r, s]).wait()


@functools.partial(jax.jit, static_argnames=("shift", "A", "A1",
                                             "last0", "T", "interpret"))
def decode_walk4v3_o1(words128, cexp, R0p, texp, T: int, shift: int,
                      A: int, A1: int, last0: int,
                      interpret: bool = False):
    """Order-1 decode walk (dense alphabet).  cexp: (A1*(A+1), B4, 128)
    per-lane packed entries; see _decode_kernel4v3_o1.  Returns
    (syms (T, B4, 128) dense indices, Rf (B4,128), cur (B4,128))."""
    B, W128, L = words128.shape
    B4 = B // S_SLOTS
    assert B4 * S_SLOTS == B and L == LANES
    rows = min(B4, 64)
    while B4 % rows:
        rows -= 1
    Tc = max(1, min(T, 128))
    while T % Tc:
        Tc -= 1
    grid = (B4 // rows, T // Tc)

    state_spec = pl.BlockSpec((rows, LANES), lambda b, t: (b, 0),
                              memory_space=pltpu.VMEM)
    syms, Rf, cur = pl.pallas_call(
        functools.partial(_decode_kernel4v3_o1, shift, Tc, A, A1, last0),
        grid=grid,
        in_specs=[
            pl.BlockSpec((A1 * (A + 1), rows, LANES),
                         lambda b, t: (0, b, 0),
                         memory_space=pltpu.VMEM),
            state_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            state_spec,
        ],
        out_specs=[
            pl.BlockSpec((Tc, rows, LANES), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            state_spec,
            state_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B4, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B4, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B4, LANES), jnp.int32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((rows, LANES), jnp.int32) for _ in range(15)]
            + [pltpu.SMEM((rows, S_SLOTS), jnp.int32),
               pltpu.SemaphoreType.DMA((rows, S_SLOTS))]),
        interpret=interpret,
    )(cexp, R0p, words128, texp)
    return syms, Rf, cur


def build_o1_dense_tables(freqs: np.ndarray, shift: int):
    """Dense-alphabet O1 boundary tables from (B, 256, 256) context
    freq tables.  Returns (packed (B, A1*(A+1)) int32, alphabet bytes
    (A,), A, A1, last0)."""
    B = freqs.shape[0]
    present = freqs.any(axis=(0, 1))          # symbols used anywhere
    alphabet = np.flatnonzero(present)
    A = len(alphabet)
    if 0 in alphabet:
        A1 = A
        last0 = int(np.searchsorted(alphabet, 0))
        ctx_bytes = alphabet
    else:
        A1 = A + 1
        last0 = A
        ctx_bytes = np.concatenate([alphabet, [0]])
    stride = A + 1
    out = np.zeros((B, A1 * stride), np.int32)
    packed = A <= 64  # 3-op compare loop (same scheme as
    # build_dec_tables_p); wider alphabets keep the counter form
    for b in range(B):
        sub = freqs[b][np.ix_(ctx_bytes, alphabet)].astype(np.int64)
        Csub = np.cumsum(sub, axis=1)
        f0 = sub[:, 0]
        for ci in range(A1):
            base = ci * stride
            fn = np.zeros(A, np.int64)
            fn[:A - 1] = sub[ci, 1:]
            if packed:
                out[b, base] = f0[ci] << 13
                j = np.arange(A, dtype=np.int64)
                ent = ((((j + 1) & 63) << 26) | (fn << 13)
                       | Csub[ci]) & 0xFFFFFFFF
                out[b, base + 1:base + 1 + A] = \
                    ent.astype(np.uint32).view(np.int32)
            else:
                out[b, base] = f0[ci] << 14
                out[b, base + 1:base + 1 + A] = (fn << 14) | Csub[ci]
    return out, alphabet, A, A1, last0


# ---------------------------------------------------------------------
# v5: incremental compact-chunk pipeline (docs/DECODE_KERNEL_NOTES.md).
#
# v3 spends ~204 ops/step realigning each slot's FULL 128-word double
# window by its consumption offset (css broadcast + 7-level align x 4
# slots).  v5 instead keeps three COMPACT registers as state — 32-lane
# segment s of (Vc, Vd, Ve) holds slot s's next three 32-word-ALIGNED
# chunks of the word stream — so:
#   - the per-step alignment shrinks to one (Vc,Vd) pair shifted
#     seg-locally by the 5-bit intra-chunk offset (cons & 31):
#     5 levels x ~6 ops = ~30 ops TOTAL (not per slot);
#   - chunk refills are static compare-selects: the next chunk after
#     Ve always sits at ring position (cons>>5)+2 in (W0||W1), one of
#     4 aligned candidates per slot, loaded only on crossings;
#   - a chunk crossing happens at most once per step (cons&31 plus
#     kseg <= 63), and the W0<-W1<-W2 DMA rotation is unchanged.
# The expand butterfly then reads the aligned pair view directly.

def _v5_init_compact(W0s, seg, rows):
    """Compact state from freshly-loaded W0: segment s <- slot s's
    chunks 0/1/2."""
    vc = jnp.zeros((rows, LANES), jnp.int32)
    vd = jnp.zeros((rows, LANES), jnp.int32)
    ve = jnp.zeros((rows, LANES), jnp.int32)
    for s in range(S_SLOTS):
        w0 = W0s[s][:]
        vc = jnp.where(seg == s,
                       pltpu.roll(w0, (s & 3) * N, axis=1), vc)
        vd = jnp.where(seg == s,
                       pltpu.roll(w0, ((s - 1) & 3) * N, axis=1), vd)
        ve = jnp.where(seg == s,
                       pltpu.roll(w0, ((s - 2) & 3) * N, axis=1), ve)
    return vc, vd, ve


def _v5_align(Vc, Vd, ofs, lane_mod):
    """Va[l] = (Vc||Vd per segment)[ofs + l]: seg-local pair shift by
    the 5-bit intra-chunk offset.  Garbage shifted into Vb's top lanes
    never reaches Va (each level reads Vb lanes < d and cumulative
    shift + d <= ofs <= 31)."""
    Va, Vb = Vc, Vd
    for d in (1, 2, 4, 8, 16):
        bit = (ofs & d) > 0
        ra = pltpu.roll(Va, LANES - d, axis=1)      # l <- Va[l+d]
        rbl = pltpu.roll(Vb, N - d, axis=1)         # l <- Vb[l+d-32]
        a_new = jnp.where(lane_mod < N - d, ra, rbl)
        Va = jnp.where(bit, a_new, Va)
        Vb = jnp.where(bit, pltpu.roll(Vb, LANES - d, axis=1), Vb)
    return Va


def _v5_expand(Va, rank, lane_mod):
    """w[l] = Va[rank[l]]: stable monotone expand (as v3)."""
    delta = lane_mod - rank
    w = Va
    for d in (16, 8, 4, 2, 1):
        sh = pltpu.roll(w, d, axis=1)
        wrap = pltpu.roll(w, 96 + d, axis=1)
        shifted = jnp.where(lane_mod >= d, sh, wrap)
        w = jnp.where((delta & d) > 0, shifted, w)
    return w


def _v5_advance(kseg, lane, seg, rows, b_idx, w_hbm,
                W0s, W1s, W2s, Vc_st, Vd_st, Ve_st, cons_t,
                jhbm_st, sem):
    """Post-step feed update: cons bump, DMA window rotation on WIN
    crossings (v3 logic, split lo/hi bitmasks), compact-chunk rotation
    and the 4-candidate aligned Ve refill on chunk crossings."""
    cons = cons_t[:]
    ofs = cons & 31
    new_cons = cons + kseg
    ccross = (ofs + kseg) >= 32
    crossing = (new_cons >= WIN).astype(jnp.int32)
    cons_t[:] = jnp.where(crossing > 0, new_cons - WIN, new_cons)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    pow_lo = jnp.where(row_id < 32, jnp.int32(1) << row_id, 0)
    pow_hi = jnp.where(row_id >= 32,
                       jnp.int32(1) << (row_id - 32), 0)
    bits = [jnp.sum(jnp.where((lane == s * N), crossing * pow_lo, 0))
            for s in range(S_SLOTS)]
    bits_hi = [jnp.sum(jnp.where((lane == s * N),
                                 crossing * pow_hi, 0))
               for s in range(S_SLOTS)]
    any_cross = bits[0] | bits[1] | bits[2] | bits[3] \
        | bits_hi[0] | bits_hi[1] | bits_hi[2] | bits_hi[3]

    @pl.when(any_cross != 0)
    def _():
        for s in range(S_SLOTS):
            for r in range(rows):
                word_rs = bits[s] if r < 32 else bits_hi[s]

                @pl.when(((word_rs >> (r & 31)) & 1) > 0)
                def _(r=r, s=s):
                    g = (b_idx * rows + r) * S_SLOTS + s
                    pltpu.make_async_copy(
                        w_hbm.at[g, jhbm_st[r, s] - 1],
                        W2s[s].at[r], sem.at[r, s]).wait()
                    W0s[s][r, :] = W1s[s][r, :]
                    W1s[s][r, :] = W2s[s][r, :]
                    pltpu.make_async_copy(
                        w_hbm.at[g, jhbm_st[r, s]], W2s[s].at[r],
                        sem.at[r, s]).start()
                    jhbm_st[r, s] = jhbm_st[r, s] + 1

    # compact rotation (reads the PRE-rotation Ve; refill below sees
    # the POST-DMA backing windows)
    ve_old = Ve_st[:]
    Vc_st[:] = jnp.where(ccross, Vd_st[:], Vc_st[:])
    Vd_st[:] = jnp.where(ccross, ve_old, Vd_st[:])
    n_ccross = jnp.sum(jnp.where(
        (lane & (N - 1)) == 0, ccross.astype(jnp.int32), 0))

    @pl.when(n_ccross > 0)
    def _():
        # refill Ve with the chunk two ahead of the new Vc: ring
        # position q = (cons>>5)+2 in the (possibly rotated) W0||W1
        # backing — 4 aligned candidates per slot
        q = (cons_t[:] >> 5) + 2
        ve_new = ve_old
        for s in range(S_SLOTS):
            for qq in range(2, 6):
                h = W0s[s] if qq < 4 else W1s[s]
                cand = pltpu.roll(h[:], ((s - qq) & 3) * N, axis=1)
                m_ = (seg == s) & (q == qq) & ccross
                ve_new = jnp.where(m_, cand, ve_new)
        Ve_st[:] = ve_new


def _decode_kernel4v5(shift: int, Tc: int, S: int, cexp_ref, f0_ref,
                      r0_ref, w_hbm, texp_ref, sym_ref, rf_ref,
                      R_st, W0a, W0b, W0c, W0d, W1a, W1b, W1c, W1d,
                      W2a, W2b, W2c, W2d, Vc_st, Vd_st, Ve_st,
                      cons_t, jhbm_st, sem):
    t_idx = pl.program_id(1)
    b_idx = pl.program_id(0)
    rows = R_st.shape[0]
    lane = _lane_iota()
    lane_mod = lane & (N - 1)
    seg = lane >> 5
    mask = (1 << shift) - 1
    W0s = (W0a, W0b, W0c, W0d)
    W1s = (W1a, W1b, W1c, W1d)
    W2s = (W2a, W2b, W2c, W2d)

    @pl.when(t_idx == 0)
    def _():
        R_st[:] = r0_ref[:]
        cons_t[:] = jnp.zeros((rows, LANES), jnp.int32)
        for r in range(rows):
            for s in range(S_SLOTS):
                jhbm_st[r, s] = 3
                g = (b_idx * rows + r) * S_SLOTS + s
                for slot, Wd in ((0, W0s[s]), (1, W1s[s])):
                    dma = pltpu.make_async_copy(
                        w_hbm.at[g, slot], Wd.at[r], sem.at[r, s])
                    dma.start()
                    dma.wait()
                pltpu.make_async_copy(
                    w_hbm.at[g, 2], W2s[s].at[r], sem.at[r, s]).start()
        Vc_st[:], Vd_st[:], Ve_st[:] = _v5_init_compact(W0s, seg, rows)

    def step(st, _):
        t_global = t_idx * Tc + st
        R = R_st[:]
        m = R & mask

        if S <= 64:
            P = (f0_ref[:] << 13)
            for j in range(S):
                e = cexp_ref[j]
                ge = m >= (e & 0x1FFF)
                P = jnp.where(ge, e, P)
            sym = jax.lax.shift_right_logical(P, 26)
            F = (P >> 13) & 0x1FFF
            C = P & 0x1FFF
        else:
            sym = jnp.zeros((rows, LANES), jnp.int32)
            P = (f0_ref[:] << 14)
            for j in range(S):
                e = cexp_ref[j]
                ge = m >= (e & 0x3FFF)
                sym = sym + ge.astype(jnp.int32)
                P = jnp.where(ge, e, P)
            F = P >> 14
            C = jnp.where(sym > 0, P & 0x3FFF, 0)

        Rn = F * jax.lax.shift_right_logical(R, shift) + (m - C)

        active = (t_global < texp_ref[:]).astype(jnp.int32)
        need = (Rn < RANS_L).astype(jnp.int32) * active
        incl = need
        for d in (1, 2, 4, 8, 16):
            sh = pltpu.roll(incl, d, axis=1)
            incl = incl + jnp.where(lane_mod >= d, sh, 0)
        rank = incl - need
        kseg = _seg_broadcast_last(incl, lane_mod)

        Va = _v5_align(Vc_st[:], Vd_st[:], cons_t[:] & 31, lane_mod)
        w = _v5_expand(Va, rank, lane_mod)

        Rn = jnp.where(need > 0, (Rn << 16) | (w & 0xFFFF), Rn)
        R_st[:] = jnp.where(active > 0, Rn, R)
        sym_ref[st] = jnp.where(active > 0, sym, 0)

        _v5_advance(kseg, lane, seg, rows, b_idx, w_hbm,
                    W0s, W1s, W2s, Vc_st, Vd_st, Ve_st, cons_t,
                    jhbm_st, sem)
        return 0

    jax.lax.fori_loop(0, Tc, step, 0)

    n_t = pl.num_programs(1)

    @pl.when(t_idx == n_t - 1)
    def _():
        rf_ref[:] = R_st[:]
        for s in range(S_SLOTS):
            for r in range(rows):
                g = (b_idx * rows + r) * S_SLOTS + s
                pltpu.make_async_copy(
                    w_hbm.at[g, jhbm_st[r, s] - 1], W2s[s].at[r],
                    sem.at[r, s]).wait()


@functools.partial(jax.jit, static_argnames=("shift", "S", "T",
                                             "interpret", "rows_cap"))
def decode_walk4v5(words128, cexp, f0exp, R0p, texp, T: int,
                   shift: int = 12, S: int = 256,
                   interpret: bool = False, rows_cap: int = 64):
    """v5 of decode_walk4 (same signature/results as v3): incremental
    compact-chunk word feed — see _decode_kernel4v5."""
    B, W128, L = words128.shape
    B4 = B // S_SLOTS
    assert B4 * S_SLOTS == B and L == LANES
    rows = min(B4, rows_cap)
    while B4 % rows:
        rows -= 1
    Tc = max(1, min(T, 128))
    while T % Tc:
        Tc -= 1
    grid = (B4 // rows, T // Tc)

    state_spec = pl.BlockSpec((rows, LANES), lambda b, t: (b, 0),
                              memory_space=pltpu.VMEM)
    syms, Rf = pl.pallas_call(
        functools.partial(_decode_kernel4v5, shift, Tc, S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, rows, LANES), lambda b, t: (0, b, 0),
                         memory_space=pltpu.VMEM),
            state_spec,
            state_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            state_spec,
        ],
        out_specs=[
            pl.BlockSpec((Tc, rows, LANES), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            state_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B4, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B4, LANES), jnp.int32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((rows, LANES), jnp.int32) for _ in range(17)]
            + [pltpu.SMEM((rows, S_SLOTS), jnp.int32),
               pltpu.SemaphoreType.DMA((rows, S_SLOTS))]),
        interpret=interpret,
    )(cexp, f0exp, R0p, words128, texp)
    return syms, Rf


# ---------------------------------------------------------------------
# Order-1 decode with the v5 compact-chunk feed (same lookup as the
# v3 O1 kernel; same signature/results as decode_walk4v3_o1).

def _decode_kernel4v5_o1(shift: int, Tc: int, A: int, A1: int,
                         last0: int, cexp_ref, r0_ref, w_hbm, texp_ref,
                         sym_ref, rf_ref, cur_ref,
                         R_st, last_st, W0a, W0b, W0c, W0d,
                         W1a, W1b, W1c, W1d, W2a, W2b, W2c, W2d,
                         Vc_st, Vd_st, Ve_st, cons_t, jhbm_st, sem):
    t_idx = pl.program_id(1)
    b_idx = pl.program_id(0)
    rows = R_st.shape[0]
    lane = _lane_iota()
    lane_mod = lane & (N - 1)
    seg = lane >> 5
    mask = (1 << shift) - 1
    W0s = (W0a, W0b, W0c, W0d)
    W1s = (W1a, W1b, W1c, W1d)
    W2s = (W2a, W2b, W2c, W2d)
    stride = A + 1

    @pl.when(t_idx == 0)
    def _():
        R_st[:] = r0_ref[:]
        last_st[:] = jnp.full((rows, LANES), last0, jnp.int32)
        cons_t[:] = jnp.zeros((rows, LANES), jnp.int32)
        for r in range(rows):
            for s in range(S_SLOTS):
                jhbm_st[r, s] = 3
                g = (b_idx * rows + r) * S_SLOTS + s
                for slot, Wd in ((0, W0s[s]), (1, W1s[s])):
                    dma = pltpu.make_async_copy(
                        w_hbm.at[g, slot], Wd.at[r], sem.at[r, s])
                    dma.start()
                    dma.wait()
                pltpu.make_async_copy(
                    w_hbm.at[g, 2], W2s[s].at[r], sem.at[r, s]).start()
        Vc_st[:], Vd_st[:], Ve_st[:] = _v5_init_compact(W0s, seg, rows)

    def step(st, _):
        t_global = t_idx * Tc + st
        R = R_st[:]
        last = last_st[:]
        m = R & mask

        if A <= 64:
            P = jnp.zeros((rows, LANES), jnp.int32)
            for c in range(A1):
                onc = last == c
                Pc = cexp_ref[c * stride]
                for j in range(A):
                    e = cexp_ref[c * stride + 1 + j]
                    ge = m >= (e & 0x1FFF)
                    Pc = jnp.where(ge, e, Pc)
                P = jnp.where(onc, Pc, P)
            sym = jax.lax.shift_right_logical(P, 26)
            F = (P >> 13) & 0x1FFF
            C = P & 0x1FFF
        else:
            sym = jnp.zeros((rows, LANES), jnp.int32)
            P = jnp.zeros((rows, LANES), jnp.int32)
            for c in range(A1):
                onc = last == c
                Pc = cexp_ref[c * stride]
                symc = jnp.zeros((rows, LANES), jnp.int32)
                for j in range(A):
                    e = cexp_ref[c * stride + 1 + j]
                    ge = m >= (e & 0x3FFF)
                    symc = symc + ge.astype(jnp.int32)
                    Pc = jnp.where(ge, e, Pc)
                sym = jnp.where(onc, symc, sym)
                P = jnp.where(onc, Pc, P)
            F = P >> 14
            C = jnp.where(sym > 0, P & 0x3FFF, 0)

        Rn = F * jax.lax.shift_right_logical(R, shift) + (m - C)

        active = (t_global < texp_ref[:]).astype(jnp.int32)
        need = (Rn < RANS_L).astype(jnp.int32) * active
        incl = need
        for d in (1, 2, 4, 8, 16):
            sh = pltpu.roll(incl, d, axis=1)
            incl = incl + jnp.where(lane_mod >= d, sh, 0)
        rank = incl - need
        kseg = _seg_broadcast_last(incl, lane_mod)

        Va = _v5_align(Vc_st[:], Vd_st[:], cons_t[:] & 31, lane_mod)
        w = _v5_expand(Va, rank, lane_mod)

        Rn = jnp.where(need > 0, (Rn << 16) | (w & 0xFFFF), Rn)
        R_st[:] = jnp.where(active > 0, Rn, R)
        last_st[:] = jnp.where(active > 0, sym, last)
        sym_ref[st] = jnp.where(active > 0, sym, 0)

        _v5_advance(kseg, lane, seg, rows, b_idx, w_hbm,
                    W0s, W1s, W2s, Vc_st, Vd_st, Ve_st, cons_t,
                    jhbm_st, sem)
        return 0

    jax.lax.fori_loop(0, Tc, step, 0)

    n_t = pl.num_programs(1)

    @pl.when(t_idx == n_t - 1)
    def _():
        rf_ref[:] = R_st[:]
        jexp = jnp.zeros((rows, LANES), jnp.int32)
        for s in range(S_SLOTS):
            jcol = jnp.array([jhbm_st[r, s] for r in range(rows)],
                             jnp.int32).reshape(rows, 1)
            jexp = jnp.where(seg == s, jcol, jexp)
        cur_ref[:] = (jexp - 3) * WIN + cons_t[:]
        for s in range(S_SLOTS):
            for r in range(rows):
                g = (b_idx * rows + r) * S_SLOTS + s
                pltpu.make_async_copy(
                    w_hbm.at[g, jhbm_st[r, s] - 1], W2s[s].at[r],
                    sem.at[r, s]).wait()


@functools.partial(jax.jit, static_argnames=("shift", "A", "A1",
                                             "last0", "T", "interpret"))
def decode_walk4v5_o1(words128, cexp, R0p, texp, T: int, shift: int,
                      A: int, A1: int, last0: int,
                      interpret: bool = False):
    """Order-1 decode walk with the v5 compact-chunk feed (same
    signature/results as decode_walk4v3_o1)."""
    B, W128, L = words128.shape
    B4 = B // S_SLOTS
    assert B4 * S_SLOTS == B and L == LANES
    rows = min(B4, 64)
    while B4 % rows:
        rows -= 1
    Tc = max(1, min(T, 128))
    while T % Tc:
        Tc -= 1
    grid = (B4 // rows, T // Tc)

    state_spec = pl.BlockSpec((rows, LANES), lambda b, t: (b, 0),
                              memory_space=pltpu.VMEM)
    syms, Rf, cur = pl.pallas_call(
        functools.partial(_decode_kernel4v5_o1, shift, Tc, A, A1,
                          last0),
        grid=grid,
        in_specs=[
            pl.BlockSpec((A1 * (A + 1), rows, LANES),
                         lambda b, t: (0, b, 0),
                         memory_space=pltpu.VMEM),
            state_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            state_spec,
        ],
        out_specs=[
            pl.BlockSpec((Tc, rows, LANES), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            state_spec,
            state_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B4, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B4, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B4, LANES), jnp.int32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((rows, LANES), jnp.int32) for _ in range(18)]
            + [pltpu.SMEM((rows, S_SLOTS), jnp.int32),
               pltpu.SemaphoreType.DMA((rows, S_SLOTS))]),
        interpret=interpret,
    )(cexp, R0p, words128, texp)
    return syms, Rf, cur


# ---------------------------------------------------------------------
# v4 experiment: rows=1 cells with DYNAMIC-roll window alignment.
#
# With one stream-row per grid cell, every per-slot cursor is a true
# scalar, so the whole css/align/compact machinery (a ~200-op chain of
# log-step masked rolls in v3) collapses to two dynamic rotates per
# slot (tpu.DynamicRotate takes traced shift amounts).  The hypothesis
# under test (VERDICT round-2 item 3): the v3 walk is bound by its
# sequential roll chain, not raw op count — v4 cuts the chain from
# ~29 roll latencies to ~12.  Bytes/step drop 8x (128 vs 1024) but so
# does the per-op VREG cost, so throughput-bound performance should
# hold while latency-bound performance improves.

def _decode_kernel4v4(shift: int, Tc: int, S: int, cexp_ref, f0_ref,
                      r0_ref, w_hbm, texp_ref, sym_ref, rf_ref,
                      R_st, W0a, W0b, W0c, W0d, W1a, W1b, W1c, W1d,
                      W2a, W2b, W2c, W2d, incl_sc, cons_sm, jhbm_st,
                      sem):
    t_idx = pl.program_id(1)
    b_idx = pl.program_id(0)
    lane = _lane_iota()
    lane_mod = lane & (N - 1)
    seg = lane >> 5
    mask = (1 << shift) - 1
    W0s = (W0a, W0b, W0c, W0d)
    W1s = (W1a, W1b, W1c, W1d)
    W2s = (W2a, W2b, W2c, W2d)

    @pl.when(t_idx == 0)
    def _():
        R_st[0:1, :] = r0_ref[0:1, :]
        for s in range(S_SLOTS):
            cons_sm[s] = 0
            jhbm_st[s] = 3
            g = b_idx * S_SLOTS + s
            for slot, Wd in ((0, W0s[s]), (1, W1s[s])):
                dma = pltpu.make_async_copy(
                    w_hbm.at[g, slot], Wd.at[0], sem.at[s])
                dma.start()
                dma.wait()
            pltpu.make_async_copy(
                w_hbm.at[g, 2], W2s[s].at[0], sem.at[s]).start()

    def step(st, _):
        t_global = t_idx * Tc + st
        R = R_st[0:1, :]
        m = R & mask

        # packed compare loop (see build_dec_tables_p)
        P = f0_ref[0:1, :] << 13
        for j in range(S):
            e = jnp.reshape(cexp_ref[0, j], (1, LANES))
            ge = m >= (e & 0x1FFF)
            P = jnp.where(ge, e, P)
        sym = jax.lax.shift_right_logical(P, 26)
        F = (P >> 13) & 0x1FFF
        C = P & 0x1FFF

        Rn = F * jax.lax.shift_right_logical(R, shift) + (m - C)

        active = (t_global < texp_ref[0:1, :]).astype(jnp.int32)
        need = (Rn < RANS_L).astype(jnp.int32) * active
        incl = need
        for d in (1, 2, 4, 8, 16):
            sh = pltpu.roll(incl, d, axis=1)
            incl = incl + jnp.where(lane_mod >= d, sh, 0)
        rank = incl - need
        incl_sc[0, :] = incl[0]  # scalar-readable per-slot totals

        # per-slot aligned next-32 window via DYNAMIC rolls
        Vc = jnp.zeros((1, LANES), jnp.int32)
        for s in range(S_SLOTS):
            cs = cons_sm[s]
            amt = (LANES - cs) & (LANES - 1)  # left-rotate by cs
            a0 = pltpu.roll(W0s[s][0:1, :], amt, axis=1)
            a1 = pltpu.roll(W1s[s][0:1, :], amt, axis=1)
            # lane l holds window[cs + l] for l < 128-cs from a0,
            # else from a1 (cs < 128 always: rotation handled below)
            al = jnp.where(lane < LANES - cs, a0, a1)
            # place the first 32 lanes into segment s
            pl32 = pltpu.roll(al, s * N, axis=1)
            Vc = jnp.where(seg == s, pl32, Vc)

        delta = lane_mod - rank
        w = Vc
        for d in (16, 8, 4, 2, 1):
            sh = pltpu.roll(w, d, axis=1)
            wrap = pltpu.roll(w, 96 + d, axis=1)
            shifted = jnp.where(lane_mod >= d, sh, wrap)
            w = jnp.where((delta & d) > 0, shifted, w)

        Rn = jnp.where(need > 0, (Rn << 16) | (w & 0xFFFF), Rn)
        R_st[0:1, :] = jnp.where(active > 0, Rn, R)
        sym_ref[st] = jnp.where(active > 0, sym, 0)[0]

        for s in range(S_SLOTS):
            ks = incl_sc[0, (s + 1) * N - 1]
            ncons = cons_sm[s] + ks

            @pl.when(ncons >= WIN)
            def _(s=s, ncons=ncons):
                g = b_idx * S_SLOTS + s
                pltpu.make_async_copy(
                    w_hbm.at[g, jhbm_st[s] - 1], W2s[s].at[0],
                    sem.at[s]).wait()
                W0s[s][0, :] = W1s[s][0, :]
                W1s[s][0, :] = W2s[s][0, :]
                pltpu.make_async_copy(
                    w_hbm.at[g, jhbm_st[s]], W2s[s].at[0],
                    sem.at[s]).start()
                jhbm_st[s] = jhbm_st[s] + 1
                cons_sm[s] = ncons - WIN

            @pl.when(ncons < WIN)
            def _(s=s, ncons=ncons):
                cons_sm[s] = ncons

        return 0

    jax.lax.fori_loop(0, Tc, step, 0)

    n_t = pl.num_programs(1)

    @pl.when(t_idx == n_t - 1)
    def _():
        rf_ref[0:1, :] = R_st[0:1, :]
        for s in range(S_SLOTS):
            g = b_idx * S_SLOTS + s
            pltpu.make_async_copy(
                w_hbm.at[g, jhbm_st[s] - 1], W2s[s].at[0],
                sem.at[s]).wait()


@functools.partial(jax.jit, static_argnames=("shift", "S", "T",
                                             "interpret"))
def decode_walk4v4(words128, cexp, f0exp, R0p, texp, T: int,
                   shift: int = 12, S: int = 64,
                   interpret: bool = False):
    """v4 experiment (same signature/results as decode_walk4v3; S<=64
    packed tables only).

    Layouts satisfy Mosaic's tiling rules for rows=1 cells: the sym
    output flattens to (T, B4*128) with (Tc, 128) blocks, per-cell
    row vectors flatten to 1D with (128,) blocks, and the table block
    is (1, S, 128) (S divisible by 8)."""
    B, W128, L = words128.shape
    B4 = B // S_SLOTS
    assert B4 * S_SLOTS == B and L == LANES and S <= 64 and S % 8 == 0
    Tc = max(1, min(T, 128))
    while T % Tc:
        Tc -= 1
    grid = (B4, T // Tc)

    # per-cell row vectors ride row 0 of an (8, 128) tile so the
    # block shape satisfies Mosaic's (8, 128) tiling
    def tile8(v):
        out = jnp.zeros((B4 * 8, LANES), jnp.int32)
        return out.at[::8].set(v.astype(jnp.int32))

    row8 = pl.BlockSpec((8, LANES), lambda b, t: (b, 0),
                        memory_space=pltpu.VMEM)
    cexp_b = jnp.swapaxes(cexp, 0, 1)           # (B4, S, LANES)
    syms_flat, Rf_flat = pl.pallas_call(
        functools.partial(_decode_kernel4v4, shift, Tc, S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, S, LANES), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            row8,
            row8,
            pl.BlockSpec(memory_space=pl.ANY),
            row8,
        ],
        out_specs=[
            pl.BlockSpec((Tc, LANES), lambda b, t: (t, b),
                         memory_space=pltpu.VMEM),
            row8,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B4 * LANES), jnp.int32),
            jax.ShapeDtypeStruct((B4 * 8, LANES), jnp.int32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((8, LANES), jnp.int32) for _ in range(13)]
            + [pltpu.VMEM((8, LANES), jnp.int32),   # incl scalars
               pltpu.SMEM((S_SLOTS,), jnp.int32),
               pltpu.SMEM((S_SLOTS,), jnp.int32),
               pltpu.SemaphoreType.DMA((S_SLOTS,))]),
        interpret=interpret,
    )(cexp_b, tile8(f0exp), tile8(R0p), words128, tile8(texp))
    return (syms_flat.reshape(T, B4, LANES), Rf_flat[::8])
