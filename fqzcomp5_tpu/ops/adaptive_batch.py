"""Cross-block batched device encode for the adaptive codecs.

The three-pass context-sorted decomposition (docs/
DEVICE_ADAPTIVE_CODECS.md) was designed for the B>1 regime: many
blocks' SEQ/FQZ sections share ONE bucketed pass-2 batch and ONE
batched pass-3 range-coder walk per wave, so the per-step lane
utilisation scales with the number of blocks in flight instead of
running B=1 walks per block.  This module is that regime: the
`-e tpu` wave driver hands a wave's worth of sections here
(tpu_driver.encode_stream_tpu), and the FQZ5_DEVICE_ADAPTIVE host
path routes through it with a single job.

Jobs are namespaced into one event stream:

  job j, model id m   ->  global row key  j * JOB_OFF + m

and grouped into four model families, each evolved in one
evolve_grouped batch across ALL jobs:

  T4    TinyModel<4>        seq codec k-mer models
  T2    TinyModel<2>        seq codec state models
  N128  AdaptiveModel<=128  fqz qual / sel / dup models
  W256  AdaptiveModel<256>  fqz length-byte + seq run/literal models

Pass 3 stacks every job's encode-event triples into (B, T) planes
(pow2-bucketed by length) and walks them in chunked device calls,
carrying the coder state across chunks so arbitrarily long sections
stream through bounded device memory.  On a single-device Pallas
backend the pass-2 triples stay DEVICE-RESIDENT (DevTriples): pass 3
gathers them by int32 index planes on device
(rc_pallas.encode_walk_compact_idx) and the chunk's output bytes
assemble on device, so the link carries ~4 B per event up and ~1 B
per payload byte down instead of the host flow's 20+ B per event.

Payloads are byte-identical to the native codecs
(native/fqzqual.cpp:663-762, native/seq.cpp:39-157); the wave driver
splices them into ordinary FQZ5 sections that the reference binary
decodes.
"""

from __future__ import annotations

import numpy as np

from . import fqz_model_jax, rc_jax
from .fqz_device_encode import (MID_LEN0, MID_SEL, build_stream,
                                prepare_fqz)
from .seq_device_encode import FAM_SEQ, FAM_STATE, build_events

JOB_OFF = 1 << 32        # > any local model id (4^14 seq ctx, 2^16+6 fqz)
CHUNK_T = 1 << 21        # pass-3 steps per device call (bounds planes)
CHUNK_T_PALLAS = 1 << 16  # the kernel's event planes are lane-padded
# (T, R, 128) int32, so its chunks stay smaller

# global model families
F_T4, F_T2, F_N128, F_W256 = 0, 1, 2, 3


def _prep_job(job):
    """Expand one job into (kind, header, events, enc_mask, fam, mid,
    sym) host arrays.  kind 'fqz' jobs carry a native wire header."""
    if job[0] == "fqz":
        _, qual, lens, flags, seq_buf, strat = job
        hdr, P, sels = prepare_fqz(qual, lens, flags, seq_buf, strat)
        if int(P.max_sym) >= 96:
            # mirror the native codec's decline (Models::init,
            # native/fqzqual.cpp): >96-symbol alphabets are outside
            # the wire format's safe envelope
            raise ValueError("fqz alphabet exceeds 96 symbols")
        la = np.ascontiguousarray(lens, np.uint32)
        mids, syms, _ = build_stream(qual, la, sels, P, seq=seq_buf)
        is_w256 = (mids >= MID_LEN0) & (mids < MID_SEL)
        fam = np.where(is_w256, F_W256, F_N128).astype(np.int8)
        enc = np.ones(len(mids), bool)
        meta = (int(P.max_sym) + 1, int(P.max_sel) + 1)
        return hdr, fam, mids, syms, enc, meta
    _, seq_buf, lens, both, slevel = job
    sfam, mid, sym, upd = build_events(seq_buf, lens, both, slevel)
    fam = np.where(sfam == FAM_SEQ, F_T4,
                   np.where(sfam == FAM_STATE, F_T2,
                            F_W256)).astype(np.int8)
    return b"", fam, mid, sym, ~upd, None


class DevTriples:
    """Device-resident pass-2 results: per-bucket (cum, freq, tot)
    jnp arrays plus a host index (`flatpos`) from global event
    position to flat vector position.  Pass 3 gathers by index ON
    DEVICE (rc_pallas.encode_walk_compact_idx), so the triples — 12+
    downloaded and 8 re-uploaded bytes per event in the host flow —
    never cross the link; only the 4-byte index plane goes up."""

    def __init__(self, n_total: int):
        self.flatpos = np.full(n_total, -1, np.int64)
        self.parts: list[tuple] = []
        self.vbase = 0

    def add(self, cs, fs, ts, posn, rloc, occ, tbe) -> None:
        self.flatpos[posn] = self.vbase + rloc * tbe + occ
        self.parts.append((cs, fs, ts))
        self.vbase += int(np.prod(cs.shape))

    def vectors(self):
        """(Vc, Vf, Vt) int32 device vectors with the inactive
        sentinel (cum 0, freq 1, tot 2) appended last, and the
        sentinel index (== self.vbase)."""
        import jax.numpy as jnp

        vs = []
        for k, dflt in ((0, 0), (1, 1), (2, 2)):
            vs.append(jnp.concatenate(
                [p[k].reshape(-1).astype(jnp.int32)
                 for p in self.parts]
                + [jnp.full(1, dflt, jnp.int32)]))
        idx = self.flatpos.copy()
        idx[idx < 0] = self.vbase
        return tuple(vs), idx


def _evolve_families(jobvec, fam, mid, sym, metas, n_total,
                     collect=None):
    """Pass 2 for the whole batch: group rows per family across jobs,
    evolve, scatter (cum, freq, tot) back to event order (or register
    device-resident with `collect`)."""
    import jax.numpy as jnp

    if collect is None:
        cum = np.zeros(n_total, np.uint32)
        freq = np.zeros(n_total, np.uint32)
        tot = np.zeros(n_total, np.uint32)
    gmid = jobvec * JOB_OFF + mid

    for F in (F_T4, F_T2, F_N128, F_W256):
        sel = np.flatnonzero(fam == F)
        if not len(sel):
            continue
        g = fqz_model_jax.group_stream(gmid[sel], sym[sel])
        uniq = g[0]
        nev = len(sel)
        if collect is None:
            out = (np.zeros(nev, np.uint32), np.zeros(nev, np.uint32),
                   np.zeros(nev, np.uint32))
        else:
            out = None
        kw = dict(out=out, collect=collect,
                  posmap=sel if collect is not None else None)
        if F in (F_T4, F_T2):
            def run(sp, ct, r, _n=4 if F == F_T4 else 2):
                return fqz_model_jax.tiny_evolve(
                    jnp.asarray(sp).astype(jnp.int32),
                    jnp.asarray(ct), nsym=_n)
            fqz_model_jax.evolve_grouped(g, run, **kw)
        elif F == F_W256:
            def run(sp, ct, r):
                mr = np.full(len(ct), 2, np.int32)
                mr[:len(r)] = 256
                return fqz_model_jax.evolve(
                    jnp.asarray(sp).astype(jnp.int32),
                    jnp.asarray(ct), jnp.asarray(mr),
                    jnp.int32(16), lanes=256)
            fqz_model_jax.evolve_grouped(g, run, **kw)
        else:
            # per-row alphabet: qual models use the job's max_sym+1,
            # the sel model max_sel+1, the dup model 2.  Rows whose
            # alphabet exceeds 128 lanes (a wide sel model) take the
            # 256-lane evolve in a second pass.
            ujob = (uniq // JOB_OFF).astype(np.int64)
            ulm = uniq % JOB_OFF
            msym = np.array([metas[j][0] if metas[j] else 2
                             for j in range(len(metas))], np.int32)
            msel = np.array([metas[j][1] if metas[j] else 2
                             for j in range(len(metas))], np.int32)
            ms_rows = np.where(ulm < MID_LEN0, msym[ujob],
                               np.where(ulm == MID_SEL, msel[ujob],
                                        2)).astype(np.int32)

            def run_w(sp, ct, r, _ms=ms_rows):
                mr = np.full(len(ct), 2, np.int32)
                mr[:len(r)] = _ms[r]
                return fqz_model_jax.evolve(
                    jnp.asarray(sp).astype(jnp.int32),
                    jnp.asarray(ct),
                    jnp.asarray(mr), jnp.int32(16), lanes=256)

            def run(sp, ct, r, _ms=ms_rows):
                mr = np.full(len(ct), 2, np.int32)
                mr[:len(r)] = _ms[r]
                return fqz_model_jax.evolve_128(
                    jnp.asarray(sp).astype(jnp.int32), ct, mr, 16)

            wide = ms_rows > 128
            if wide.any():
                fqz_model_jax.evolve_grouped(
                    g, run_w, rows=np.flatnonzero(wide), **kw)
            if not wide.all():
                fqz_model_jax.evolve_grouped(
                    g, run, rows=np.flatnonzero(~wide), **kw)
        if collect is None:
            cum[sel] = out[0]
            freq[sel] = out[1]
            tot[sel] = out[2]
    if collect is not None:
        return None
    return cum, freq, tot


def rc_walk_batch(streams):
    """Pass 3: walk many (cum, freq, tot) streams as batched range
    coders.  Streams bucket by pow2 length (padding stays < 2x) and
    long buckets walk in CHUNK_T-step device calls with the state
    carried across chunks.  Returns list of payload bytes."""
    outs = [b""] * len(streams)
    buckets: dict[int, list[int]] = {}
    for i, (c, _f, _t) in enumerate(streams):
        if len(c) == 0:
            # empty stream still runs finish_encode: 5 shift_lows from
            # the initial state
            z = np.zeros(1, np.uint32)
            st = (z, np.full(1, 0xFFFFFFFF, np.uint32), z, z, z)
            outs[i] = rc_jax.finish_events(st)[0]
            continue
        buckets.setdefault(fqz_model_jax.pow2(len(c)), []).append(i)

    from . import backend

    for T2, idxs in sorted(buckets.items()):
        B = len(idxs)
        B2 = fqz_model_jax.pow2(B)
        B2 += backend.pad_rows(B2)  # mesh-divisible walk batch
        cum = np.zeros((B2, T2), np.uint32)
        freq = np.ones((B2, T2), np.uint32)
        tot = np.full((B2, T2), 2, np.uint32)
        active = np.zeros((B2, T2), bool)
        for r, i in enumerate(idxs):
            c, f, t = streams[i]
            n = len(c)
            cum[r, :n], freq[r, :n], tot[r, :n] = c, f, t
            active[r, :n] = True

        # the Pallas walk keeps the five coder registers in VMEM for
        # the whole chunk (the scan pays XLA per-step overheads); the
        # mesh-sharded path stays on the scan
        use_pallas = (backend._use_pallas()
                      and backend.current_mesh() is None)
        if use_pallas:
            from . import rc_pallas
        chunk = CHUNK_T_PALLAS if use_pallas else CHUNK_T

        state = None
        parts: list[list[bytes]] = [[] for _ in idxs]
        for t0 in range(0, T2, chunk):
            t1 = min(t0 + chunk, T2)
            if use_pallas:
                # compact path: chunk bytes assemble ON DEVICE, the
                # link carries ~1 byte per output byte instead of 16
                # bytes per coded symbol of raw event planes
                state, by, totals = rc_pallas.encode_walk_compact(
                    cum[:, t0:t1], freq[:, t0:t1], tot[:, t0:t1],
                    active=active[:, t0:t1], state0=state)
                for r, i in enumerate(idxs):
                    parts[r].append(by[r, :totals[r]].tobytes())
                continue
            state, (fl, ca, ff, cy) = rc_jax.encode_scan(
                backend.shard_rows(cum[:, t0:t1], 1),
                backend.shard_rows(freq[:, t0:t1], 1),
                backend.shard_rows(tot[:, t0:t1], 1),
                active=backend.shard_rows(active[:, t0:t1], 1),
                state0=state)
            fl, ca, ff, cy = map(np.asarray, (fl, ca, ff, cy))
            for r, i in enumerate(idxs):
                parts[r].append(rc_jax.assemble_stream(
                    fl[r], ca[r], ff[r], cy[r], b""))
        tails = rc_jax.finish_events(state)
        for r, i in enumerate(idxs):
            outs[i] = b"".join(parts[r]) + tails[r]
    return outs


def _batch_budget_bytes() -> int:
    """Input bytes per batched chunk.  One event costs ~50-60 B of
    transient host memory across the three passes (event triple +
    sorted copies + rc planes), so an unbounded wave of 100 MB
    sections would need tens of GB; chunking keeps the working set
    bounded while leaving plenty of batch width for the device walks.
    Jobs are independent, so chunking never changes payload bytes."""
    import os

    return int(os.environ.get("FQZ5_ADAPTIVE_BATCH_MB", "128")) << 20


def encode_adaptive_batch(jobs) -> list[bytes]:
    """Encode many adaptive-codec jobs in batched three-pass runs.

    jobs: list of ('fqz', qual, lens, flags, seq_buf, strat) or
    ('seq', seq_buf, lens, both, slevel) tuples.  Returns the complete
    section payload per job (fqz jobs include the native wire header),
    byte-identical to the host codecs.  Waves whose summed input
    exceeds the memory budget run as several independent chunks."""
    if not jobs:
        return []
    budget = _batch_budget_bytes()
    total_in = sum(len(j[1]) for j in jobs)
    if total_in > budget and len(jobs) > 1:
        outs: list[bytes] = []
        chunk: list = []
        acc = 0
        for j in jobs:
            if chunk and acc + len(j[1]) > budget:
                outs.extend(_encode_adaptive_chunk(chunk))
                chunk, acc = [], 0
            chunk.append(j)
            acc += len(j[1])
        if chunk:
            outs.extend(_encode_adaptive_chunk(chunk))
        return outs
    return _encode_adaptive_chunk(jobs)


def _encode_adaptive_chunk(jobs) -> list[bytes]:
    preps = [_prep_job(j) for j in jobs]
    hdrs = [p[0] for p in preps]
    metas = [p[5] for p in preps]
    n_ev = np.array([len(p[2]) for p in preps], np.int64)
    base = np.concatenate(([0], np.cumsum(n_ev)))
    total = int(base[-1])

    jobvec = np.repeat(np.arange(len(jobs), dtype=np.int64), n_ev)
    fam = np.concatenate([p[1] for p in preps]) if total else \
        np.zeros(0, np.int8)
    mid = np.concatenate([p[2] for p in preps]) if total else \
        np.zeros(0, np.int64)
    sym = np.concatenate([p[3] for p in preps]) if total else \
        np.zeros(0, np.int32)

    from . import backend

    if (backend._use_pallas() and backend.current_mesh() is None
            and _dev_resident()):
        # device-resident handoff: pass-2 triples never leave the
        # device; pass 3 gathers them by index planes
        collect = DevTriples(total)
        _evolve_families(jobvec, fam, mid, sym, metas, total,
                         collect=collect)
        V, flatpos = collect.vectors()
        streams_idx = []
        for j, p in enumerate(preps):
            sl = slice(base[j], base[j + 1])
            enc = p[4]
            streams_idx.append(flatpos[sl][enc])
        payloads = rc_walk_batch_idx(streams_idx, V)
        return [hdrs[j] + payloads[j] for j in range(len(jobs))]

    cum, freq, tot = _evolve_families(jobvec, fam, mid, sym, metas,
                                      total)

    streams = []
    for j, p in enumerate(preps):
        sl = slice(base[j], base[j + 1])
        enc = p[4]
        streams.append((cum[sl][enc], freq[sl][enc], tot[sl][enc]))
    payloads = rc_walk_batch(streams)
    return [hdrs[j] + payloads[j] for j in range(len(jobs))]


def _dev_resident() -> bool:
    import os

    env = os.environ.get("FQZ5_DEV_RESIDENT")
    if env is not None:
        return env not in ("0", "false", "")
    return True


def rc_walk_batch_idx(streams_idx, V):
    """Pass 3 over device-resident triples: streams are INDEX arrays
    into V; the chunked walk uploads 4 B per event and downloads the
    compacted chunk bytes (see rc_pallas.encode_walk_compact_idx).
    Same bucketing/chunking as rc_walk_batch; payload bytes
    identical."""
    from . import rc_pallas

    sentinel = int(V[0].shape[0] - 1)
    outs = [b""] * len(streams_idx)
    buckets: dict[int, list[int]] = {}
    for i, si in enumerate(streams_idx):
        if len(si) == 0:
            z = np.zeros(1, np.uint32)
            st = (z, np.full(1, 0xFFFFFFFF, np.uint32), z, z, z)
            outs[i] = rc_jax.finish_events(st)[0]
            continue
        buckets.setdefault(fqz_model_jax.pow2(len(si)), []).append(i)

    for T2, idxs in sorted(buckets.items()):
        B2 = fqz_model_jax.pow2(len(idxs))
        IDX = np.full((B2, T2), sentinel, np.int32)
        for r, i in enumerate(idxs):
            IDX[r, :len(streams_idx[i])] = streams_idx[i]
        state = None
        parts: list[list[bytes]] = [[] for _ in idxs]
        for t0 in range(0, T2, CHUNK_T_PALLAS):
            t1 = min(t0 + CHUNK_T_PALLAS, T2)
            state, by, totals = rc_pallas.encode_walk_compact_idx(
                V, IDX[:, t0:t1], state0=state)
            for r, i in enumerate(idxs):
                parts[r].append(by[r, :totals[r]].tobytes())
        tails = rc_jax.finish_events(state)
        for r, i in enumerate(idxs):
            outs[i] = b"".join(parts[r]) + tails[r]
    return outs
