"""End-to-end device encode for the order-k sequence codec: the same
three-pass context-sorted decomposition as the fqz quality codec
(docs/DEVICE_ADAPTIVE_CODECS.md), specialised to the SEQ wire format
(native/seq.cpp:39-157; reference encode_seq, fqzcomp5.c:1073-1270).

Streams and models:
  seq_model    TinyModel<4> per 4^k k-mer context; in both-strands
               mode every base also adapt-only updates the
               reverse-complement context (no output byte)
  run_len[3]   AdaptiveModel<256,16> per state: class-run lengths in
               255-chunks
  state_model  TinyModel<2> per state: run-class transitions
  literal      AdaptiveModel<256,16>: raw bytes of 'other' runs

Pass 1 computes the forward/reverse k-mer contexts with a records-
batched scan (contexts reseed per record; 'other' bytes leave them
untouched).  The host merges run/transition/base events into one
stream, pass 2 evolves each model family in a batch (tiny_evolve for
the 4- and 2-symbol models, evolve for the 256-symbol ones) and
pass 3 serialises the encode-event triples through the range-coder
walk.  The payload byte-matches native seq_encode
(tests/test_seq_device_encode.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import fqz_model_jax

SEED_FWD = 0x007616C7
SEED_REV = 0x2C6B62FF

_LUT = np.full(256, 4, np.int32)
for _i, _c in enumerate(b"ACGT"):
    _LUT[_c] = _i
for _i, _c in enumerate(b"acgt"):
    _LUT[_c] = 0x80 + _i

# model-family tags in the merged event stream
FAM_SEQ = 0      # TinyModel<4> per k-mer context
FAM_STATE = 1    # TinyModel<2> per state
FAM_WIDE = 2     # AdaptiveModel<256,16>: run_len[0..2]=0..2, literal=3
MID_LITERAL = 3


@partial(jax.jit, static_argnames=("ctx_size",))
def seq_contexts(codes, ctx_size):
    """Forward/reverse k-mer context walk, records along rows.

    codes: (R, L) int32 base codes (pad with 4); returns per byte
    (ctx_fwd BEFORE the byte, base, ctx_rev AFTER the byte, rev base)
    — garbage on non-base bytes."""
    R, L = codes.shape
    mask = jnp.uint32((1 << (2 * ctx_size)) - 1)
    hi = 2 * ctx_size - 2

    last0 = jnp.full((R,), SEED_FWD & ((1 << (2 * ctx_size)) - 1),
                     jnp.uint32)
    last20 = jnp.full((R,), (SEED_REV >> (32 - 2 * ctx_size)) &
                      ((1 << (2 * ctx_size)) - 1), jnp.uint32)

    def stepf(carry, code):
        last, last2 = carry
        isbase = (code < 4) | (code >= 0x80)
        b = (code & 3).astype(jnp.uint32)
        ctxf = last
        last_n = ((last << 2) + b) & mask
        b2 = last2 & 3
        last2_n = (last2 >> 2) + ((jnp.uint32(3) - b) << hi)
        last = jnp.where(isbase, last_n, last)
        last2 = jnp.where(isbase, last2_n, last2)
        return (last, last2), (ctxf, b, last2, b2)

    codesT = jnp.swapaxes(codes, 0, 1)  # (L, R)
    _, (ctxf, b, ctxr, b2) = jax.lax.scan(stepf, (last0, last20),
                                          codesT)
    return (jnp.swapaxes(ctxf, 0, 1), jnp.swapaxes(b, 0, 1),
            jnp.swapaxes(ctxr, 0, 1), jnp.swapaxes(b2, 0, 1))


def build_events(seq_buf: bytes, lens, both_strands: int,
                 ctx_size: int):
    """Merge the full event stream in native encode order.  Returns
    (fam int8, mid int64, sym int32, upd bool) arrays."""
    buf = np.frombuffer(seq_buf, np.uint8)
    lens = np.asarray(lens, np.uint32)
    n = len(buf)
    if n == 0:
        return (np.zeros(0, np.int8), np.zeros(0, np.int64),
                np.zeros(0, np.int32), np.zeros(0, bool))
    code = _LUT[buf]
    cls = np.where(code < 4, 0, np.where(code >= 0x80, 1, 2))

    # pass 1 on device, records along rows; pow2 padding keeps one
    # compile per shape bucket (pad code 4 = non-base, contexts hold)
    nrec = len(lens)
    Lmax = int(lens.max()) if nrec else 0
    R2 = fqz_model_jax.pow2(nrec)
    L2 = fqz_model_jax.pow2(Lmax)
    ends = np.cumsum(lens.astype(np.int64))
    starts = ends - lens
    codes2d = np.full((R2, L2), 4, np.int32)
    rows_f = np.repeat(np.arange(nrec), lens)
    cols_f = np.arange(n) - np.repeat(starts, lens)
    codes2d[rows_f, cols_f] = code
    ctxf, b, ctxr, b2 = (np.asarray(x)[:nrec, :Lmax] for x in
                         seq_contexts(codes2d, ctx_size))
    # flatten back to stream order via the same ragged index
    ctxf_f = ctxf[rows_f, cols_f].astype(np.int64)
    b_f = b[rows_f, cols_f].astype(np.int32)
    ctxr_f = ctxr[rows_f, cols_f].astype(np.int64)
    b2_f = b2[rows_f, cols_f].astype(np.int32)

    # maximal class runs over the FLAT buffer (they cross records)
    bounds = np.flatnonzero(np.diff(cls)) + 1
    rstarts = np.concatenate(([0], bounds))
    rends = np.concatenate((bounds, [n]))
    fam_l, mid_l, sym_l, upd_l = [], [], [], []

    def emit(fam, mid, sym, upd=None):
        fam_l.append(np.full(len(mid), fam, np.int8))
        mid_l.append(np.asarray(mid, np.int64))
        sym_l.append(np.asarray(sym, np.int32))
        upd_l.append(np.zeros(len(mid), bool) if upd is None
                     else np.asarray(upd, bool))

    state = 0  # kUpper
    first = True
    for rs, re in zip(rstarts, rends):
        rcls = int(cls[rs])
        if first and rcls != 0:
            # the machine starts in kUpper: a zero-length run plus a
            # transition precede a buffer that opens lower/other
            emit(FAM_WIDE, [state], [0])
            tsym = (state == 2) if rcls == 1 else (0 if rcls == 0
                                                   else 1)
            emit(FAM_STATE, [state], [int(tsym)])
            state = rcls
        first = False
        run = re - rs
        chunks = [255] * (run // 255) + [run % 255]
        emit(FAM_WIDE, [state] * len(chunks), chunks)
        if rcls < 2:
            if both_strands:
                # base encode + shadow update interleave per byte
                mid = np.empty(2 * run, np.int64)
                sym = np.empty(2 * run, np.int32)
                upd = np.zeros(2 * run, bool)
                mid[0::2] = ctxf_f[rs:re]
                sym[0::2] = b_f[rs:re]
                mid[1::2] = ctxr_f[rs:re]
                sym[1::2] = b2_f[rs:re]
                upd[1::2] = True
                emit(FAM_SEQ, mid, sym, upd)
            else:
                emit(FAM_SEQ, ctxf_f[rs:re], b_f[rs:re])
        else:
            emit(FAM_WIDE, [MID_LITERAL] * run, buf[rs:re])
        if re < n:
            ncls = int(cls[re])
            tsym = 0 if ncls == 0 else ((state == 2) if ncls == 1
                                        else 1)
            emit(FAM_STATE, [state], [int(tsym)])
            state = ncls
    return (np.concatenate(fam_l), np.concatenate(mid_l),
            np.concatenate(sym_l), np.concatenate(upd_l))


def encode_payload(seq_buf: bytes, lens, both_strands: int,
                   ctx_size: int) -> bytes:
    """Device range-coder payload for one SEQ block — byte-identical
    to native fqz5_seq_encode.  Routed through the cross-block batch
    machinery with a single job so one implementation serves both the
    host driver and the wave engine."""
    from .adaptive_batch import encode_adaptive_batch

    return encode_adaptive_batch(
        [("seq", seq_buf, lens, both_strands, ctx_size)])[0]
