"""Pass 2 of the fqz-qual device decomposition: per-context model
evolution.

The SIMPLE_MODEL recurrence (c_simple_model.h:63-171; native/rc.h
AdaptiveModel) looked sequential — the bubble reordering makes each
occurrence's cumulative frequency depend on the whole history — but it
vectorises along a different axis: the model's symbol ARRAY lives on
the 128 lanes (position-major: lane j holds (sym, freq) of array slot
j), and thousands of independent CONTEXTS batch along rows.  Each step
then processes occurrence t of every context at once:

  find     pos of the encoded symbol   -> lane compare + index reduce
  cum      sum of freqs before pos     -> masked lane reduce
  bump     freq += STEP at pos         -> masked add
  norm     f -= f>>1 when tot overflows-> elementwise (zeros stay zero,
                                          so the reference's stop-at-
                                          zero loop is equivalent)
  bubble   adjacent swap when the bumped freq passes its neighbour
                                       -> two masked selects

Occurrences are grouped per context beforehand (a stable sort of the
pass-1 context plane); contexts with fewer occurrences than the step
index are masked.  Work is O(total_bytes * 128 lanes) — the lane
blowup buys full vectorisation of a branch-and-pointer CPU loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

K_MAX_FREQ = (1 << 16) - 17


@partial(jax.jit, static_argnames=("lanes",))
def evolve(symplane, counts, max_sym, step_inc, lanes=128):
    """Evolve C independent AdaptiveModels.

    symplane: (C, T) int32 — context c's t-th encoded symbol (padded);
    counts: (C,) int32 occurrence counts; max_sym: scalar int32 or
    (C,) vector (model init size — per-row so one batch can mix the
    qual models with the len/sel/dup overhead models); step_inc:
    scalar int32 (STEP); lanes: model array capacity — 128 covers the
    qual/sel/dup models, the AdaptiveModel<256> length-byte models
    need 256 (two lane registers per row).

    Returns (cum, freq, tot): (C, T) uint32 planes of the triples each
    encode uses (garbage past counts[c])."""
    C, T = symplane.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)

    ms = jnp.broadcast_to(jnp.reshape(jnp.asarray(max_sym, jnp.int32),
                                      (-1, 1)), (C, 1))
    sym0 = jnp.broadcast_to(lane, (C, lanes)).astype(jnp.int32)
    freq0 = jnp.where(lane < ms, 1, 0).astype(jnp.int32)
    tot0 = ms

    def stepf(carry, t):
        symv, freqv, tot = carry
        s = jax.lax.dynamic_slice_in_dim(symplane, t, 1, 1)  # (C,1)
        active = (t < counts)[:, None]

        onpos = symv == s                      # (C, lanes) one-hot
        pos = jnp.sum(jnp.where(onpos, lane, 0), axis=1, keepdims=True)
        cum = jnp.sum(jnp.where(lane < pos, freqv, 0), axis=1,
                      keepdims=True)
        f = jnp.sum(jnp.where(onpos, freqv, 0), axis=1, keepdims=True)

        # bump
        freq2 = freqv + jnp.where(onpos, step_inc, 0)
        tot2 = tot + step_inc
        # normalize on overflow (zeros stay zero)
        over = tot2 > K_MAX_FREQ
        fn = freq2 - (freq2 >> 1)
        freq2 = jnp.where(over, fn, freq2)
        tot2 = jnp.where(over,
                         jnp.sum(freq2, axis=1, keepdims=True), tot2)
        # bubble: swap pos-1 <-> pos when freq[pos] > freq[pos-1]
        fval = jnp.sum(jnp.where(onpos, freq2, 0), axis=1,
                       keepdims=True)
        onprev = lane == (pos - 1)
        fprev = jnp.sum(jnp.where(onprev, freq2, 0), axis=1,
                        keepdims=True)
        sprev = jnp.sum(jnp.where(onprev, symv, 0), axis=1,
                        keepdims=True)
        do = (pos > 0) & (fval > fprev)
        symv2 = jnp.where(do & onpos, sprev,
                          jnp.where(do & onprev, s, symv))
        freq3 = jnp.where(do & onpos, fprev,
                          jnp.where(do & onprev, fval, freq2))

        symv2 = jnp.where(active, symv2, symv)
        freq3 = jnp.where(active, freq3, freqv)
        tot2 = jnp.where(active, tot2, tot)
        return (symv2, freq3, tot2), (cum[:, 0], f[:, 0], tot[:, 0])

    (_, _, _), (cums, freqs, tots) = jax.lax.scan(
        stepf, (sym0, freq0, tot0), jnp.arange(T, dtype=jnp.int32))
    return (jnp.swapaxes(cums, 0, 1).astype(jnp.uint32),
            jnp.swapaxes(freqs, 0, 1).astype(jnp.uint32),
            jnp.swapaxes(tots, 0, 1).astype(jnp.uint32))


@partial(jax.jit, static_argnames=("nsym",))
def tiny_evolve(symplane, counts, nsym=4):
    """Evolve C independent TinyModels (native/rc.h TinyModel; the
    seq codec's per-k-mer and state models).

    Far simpler than the AdaptiveModel: no reordering, STEP 1,
    normalisation when the PRE-bump total reaches 255.  Contexts ride
    the lanes; the nsym-wide freq vector is a tiny leading axis.
    Update-only events (the both-strands shadow walk) mutate state
    identically to encodes, so callers simply ignore their triples.

    symplane: (C, T) int32; counts: (C,) int32.  Returns (cum, freq,
    tot) uint32 (C, T) planes."""
    C, T = symplane.shape
    sidx = jax.lax.broadcasted_iota(jnp.int32, (nsym, 1), 0)
    freq0 = jnp.ones((nsym, C), jnp.int32)
    symT = jnp.swapaxes(symplane, 0, 1)  # (T, C)

    def stepf(freqv, inp):
        s, t = inp
        active = (t < counts)[None, :]
        onpos = sidx == s[None, :]
        tot = jnp.sum(freqv, axis=0)
        cum = jnp.sum(jnp.where(sidx < s[None, :], freqv, 0), axis=0)
        f = jnp.sum(jnp.where(onpos, freqv, 0), axis=0)
        freq2 = freqv + jnp.where(onpos, 1, 0)
        freq2 = jnp.where(tot[None, :] >= 255, freq2 - (freq2 >> 1),
                          freq2)
        freq2 = jnp.where(active, freq2, freqv)
        return freq2, (cum, f, tot)

    _, (cums, freqs, tots) = jax.lax.scan(
        stepf, freq0, (symT, jnp.arange(T, dtype=jnp.int32)))
    return (jnp.swapaxes(cums, 0, 1).astype(jnp.uint32),
            jnp.swapaxes(freqs, 0, 1).astype(jnp.uint32),
            jnp.swapaxes(tots, 0, 1).astype(jnp.uint32))


def pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length()


def evolve_128(symplane, counts, max_sym, step_inc: int = 16):
    """128-lane evolve with backend dispatch: the Pallas walk on a
    real TPU (big buckets), the lax.scan formulation elsewhere
    (CPU tests, meshes, small buckets).  Bit-identical either way
    (tests/test_model_pallas.py)."""
    import jax.numpy as jnp

    from fqzcomp5_tpu.ops import backend

    C, T = symplane.shape
    if (backend._use_pallas() and backend.current_mesh() is None
            and T >= 128):
        from fqzcomp5_tpu.ops import model_pallas

        sp = np.asarray(symplane)
        Cp = -(-C // model_pallas.C_BLK) * model_pallas.C_BLK
        Tp = -(-T // 128) * 128
        spp = np.zeros((Cp, Tp), np.int32)
        spp[:C, :T] = sp
        ctp = np.zeros((Cp, 1), np.int32)
        ctp[:C, 0] = np.asarray(counts)[:C]
        msp = np.full((Cp, 1), 2, np.int32)
        msp[:C, 0] = np.broadcast_to(np.asarray(max_sym), (C,))
        cum, freq, tot = model_pallas.evolve_walk(
            jnp.asarray(spp), jnp.asarray(ctp), jnp.asarray(msp),
            int(step_inc))
        return cum[:C, :T], freq[:C, :T], tot[:C, :T]
    return evolve(jnp.asarray(symplane), jnp.asarray(counts),
                  jnp.asarray(max_sym), jnp.int32(step_inc),
                  lanes=128)


def evolve_by_count(symplane, counts, run):
    """Evolve with rows bucketed by occurrence count.

    A skewed context distribution makes the naive (C, Tmax) plane
    mostly padding (one hot context sets Tmax while thousands of cold
    rows hold 1-2 events), so the scan does C x Tmax work for
    sum(counts) useful cells.  Bucketing rows into power-of-4 count
    classes bounds the padded area at ~4x the useful cells and keeps
    a handful of compiled shapes.

    run(sub_plane, sub_counts, row_idx) -> (cum, freq, tot) jnp
    arrays; sub arrays arrive pow2-padded on both dims."""
    C, T = symplane.shape
    cum = np.zeros((C, T), np.uint32)
    freq = np.zeros((C, T), np.uint32)
    tot = np.zeros((C, T), np.uint32)
    done = np.zeros(C, bool)
    tb = 16
    while True:
        tb = min(tb, max(T, 1))
        rows = np.flatnonzero(~done & (counts <= tb))
        if len(rows):
            from fqzcomp5_tpu.ops import backend

            C2 = pow2(len(rows))
            C2 += backend.pad_rows(C2)  # mesh-divisible row count
            sp = np.zeros((C2, tb), symplane.dtype)
            sp[:len(rows)] = symplane[rows, :tb]
            ct = np.zeros(C2, counts.dtype)
            ct[:len(rows)] = counts[rows]
            cs, fs, ts = run(backend.shard_rows(sp, extra_dims=1),
                             backend.shard_rows(ct), rows)
            cs, fs, ts = (np.asarray(x)[:len(rows)]
                          for x in (cs, fs, ts))
            cum[rows, :tb] = cs
            freq[rows, :tb] = fs
            tot[rows, :tb] = ts
            done[rows] = True
        if tb >= T or done.all():
            break
        tb *= 4
    return cum, freq, tot


def group_by_context(ctx: np.ndarray, qm: np.ndarray):
    """Stable-group a stream's (ctx, sym) sequence by context.

    Returns (uniq_ctx, symplane (C, Tmax), counts (C,), order) where
    `order` maps plane cell (c, t) back to the stream position (for
    un-sorting the triples)."""
    order = np.argsort(ctx, kind="stable")
    sorted_ctx = ctx[order]
    uniq, starts, counts = np.unique(sorted_ctx, return_index=True,
                                     return_counts=True)
    C = len(uniq)
    Tmax = int(counts.max()) if C else 0
    symplane = np.zeros((C, Tmax), np.int32)
    posplane = np.full((C, Tmax), -1, np.int64)
    # occurrence index within each context
    occ = np.arange(len(ctx)) - np.repeat(starts, counts)
    rows = np.repeat(np.arange(C), counts)
    symplane[rows, occ] = qm[order]
    posplane[rows, occ] = order
    return uniq, symplane, counts.astype(np.int32), posplane


def triples_for_stream(ctx: np.ndarray, qm: np.ndarray, max_sym: int,
                       step_inc: int = 16):
    """Convenience: full pass-2 for one stream — group, evolve,
    un-sort.  Returns (cum, freq, tot) uint32 arrays in stream order."""
    uniq, symplane, counts, posplane = group_by_context(ctx, qm)
    cums, freqs, tots = evolve(jnp.asarray(symplane),
                               jnp.asarray(counts),
                               jnp.int32(max_sym), jnp.int32(step_inc))
    cums, freqs, tots = map(np.asarray, (cums, freqs, tots))
    n = len(ctx)
    out_c = np.zeros(n, np.uint32)
    out_f = np.zeros(n, np.uint32)
    out_t = np.zeros(n, np.uint32)
    valid = posplane >= 0
    out_c[posplane[valid]] = cums[valid]
    out_f[posplane[valid]] = freqs[valid]
    out_t[posplane[valid]] = tots[valid]
    return out_c, out_f, out_t
