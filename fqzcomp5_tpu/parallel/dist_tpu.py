"""Distributed x device-engine composition: the wave engine
(tpu_driver) running under jax.distributed multi-process sharding.

Waves — not single blocks — round-robin over the processes: wave w is
owned by process `w % N`.  The owner parses its wave's byte ranges
(fastq.scan_blocks metadata; parse-once, like the host distributed
path), runs the full wave engine on its local device/mesh slice
(tpu_driver.encode_wave_blocks: batched device rANS + cross-block
adaptive batch + learning state machine), and the serialized blocks
all-gather to process 0 per round of N waves.

Learner lock-step without redundant codec work: every process decides
— deterministically, from its own learner state — whether a wave can
contain trial activity (any section in trial, or a review re-opening
within the wave: learning.review_remaining).  For such waves the
owner's trial-stats journal is all-gathered and peers REPLAY it
through the exact methods_for call pattern the wave engine used
(_tick_section_wave mirrors tpu_driver._encode_section_wave's segment
walk); locked waves tick bare methods_for calls with no collective.

Output is byte-identical to the single-process `-e tpu` encoder for
any process count (tests/test_dist_tpu.py).
"""

from __future__ import annotations

import struct
from typing import BinaryIO

from fqzcomp5_tpu import container, fastq
from fqzcomp5_tpu.constants import Section
from fqzcomp5_tpu.learning import (MethodLearner, journal_dumps,
                                   journal_loads)
from fqzcomp5_tpu.options import Options, method_avail_for

_WAVE_SECS = (Section.SEQ, Section.QUAL)   # section-wave order in
# tpu_driver.encode_wave_blocks; NAME ticks per block afterwards


def _tick_section_wave(learner: MethodLearner, sec: int, n: int,
                       journal_q: list) -> None:
    """Advance one section's learner state for a peer-owned wave of n
    blocks, replaying the owner's trial stats.  Mirrors the exact
    methods_for/record_trial sequence of
    tpu_driver._encode_section_wave."""
    bi = 0
    while bi < n:
        mask = learner.methods_for(sec)
        if learner.in_trial(sec):
            take = min(learner.trial_remaining(sec), n - bi)
            for _ in range(take - 1):
                learner.methods_for(sec)
            for _ in range(take):
                if not journal_q:
                    raise RuntimeError(
                        f"journal underrun for section {sec}")
                learner.record_trial(sec, journal_q.pop(0))
            bi += take
        else:
            seg = 1
            while bi + seg < n and not learner.will_reopen(sec):
                m2 = learner.methods_for(sec)
                if m2 != mask:
                    break
                seg += 1
            bi += seg


def _tick_wave(learner: MethodLearner, n: int, journal: list) -> None:
    """Advance the whole learner for a peer-owned wave (SEQ and QUAL
    section-waves, then NAME per block), replaying the owner's
    journal.  Journal entries are (sec, sizes) in record order, which
    is [SEQ...][QUAL...] then NAME interleaved per block."""
    by_sec: dict[int, list] = {}
    for sec, sizes in journal:
        by_sec.setdefault(int(sec), []).append(sizes)
    for sec in _WAVE_SECS:
        _tick_section_wave(learner, int(sec), n,
                           by_sec.get(int(sec), []))
    nq = by_sec.get(int(Section.NAME), [])
    for _ in range(n):
        learner.methods_for(Section.NAME)
        if learner.in_trial(Section.NAME):
            if not nq:
                raise RuntimeError("journal underrun for NAME")
            learner.record_trial(Section.NAME, nq.pop(0))


def _wave_needs_sync(learner: MethodLearner, n: int) -> bool:
    """True when this wave can produce trial stats (deterministic from
    lock-step learner state, so every process agrees)."""
    return any(learner.in_trial(s) or learner.review_remaining(s) <= n
               for s in (Section.NAME, Section.SEQ, Section.QUAL))


def encode_file_dist_tpu(in_path: str, out_fp: BinaryIO | None,
                         arg: Options, blocks, *, process_id: int,
                         num_processes: int) -> None:
    """blocks: fastq.scan_blocks output.  Only process 0 writes."""
    from fqzcomp5_tpu.parallel.distributed import (STATS,
                                                   _gather_round)
    from fqzcomp5_tpu.tpu_driver import (encode_wave_blocks,
                                         wave_groups_from_sizes)

    learner = MethodLearner()
    learner.method_avail = method_avail_for(arg)
    if process_id == 0:
        container.write_header(out_fp)
    idx = container.FileIndex()

    # identical wave grouping everywhere: scan metadata only (clean
    # 4-line FASTQ, so qual bytes == seq bytes)
    groups = wave_groups_from_sizes([2 * b[3] for b in blocks])
    waves = []
    base = 0
    for g in groups:
        waves.append(blocks[base:base + g])
        base += g

    round_pay: list[bytes | None] = [None] * num_processes
    round_meta: list[list | None] = [None] * num_processes

    def flush_round():
        nonlocal round_pay, round_meta
        if not any(m is not None for m in round_meta):
            return
        gathered = _gather_round(round_pay, process_id)
        if process_id == 0:
            for p in range(num_processes):
                if round_meta[p] is None:
                    continue
                blob = round_pay[p] if round_pay[p] is not None \
                    else gathered[p]
                off = 0
                for seq_bytes, nrec in round_meta[p]:
                    (blen,) = struct.unpack_from("<I", blob, off)
                    off += 4
                    idx.add(out_fp.tell(), seq_bytes, nrec)
                    out_fp.write(blob[off:off + blen])
                    off += blen
                if off != len(blob):
                    raise RuntimeError("wave blob framing mismatch")
        round_pay = [None] * num_processes
        round_meta = [None] * num_processes

    for w, wblocks in enumerate(waves):
        owner = w % num_processes
        needs_sync = _wave_needs_sync(learner, len(wblocks))
        jblob = b""
        if owner == process_id:
            from fqzcomp5_tpu.parallel.distributed import _work_timer

            with _work_timer():
                batch = [fastq.parse_block_range(in_path, b[0], b[1])
                         for b in wblocks]
                STATS["parse_bytes"] += sum(b[1] - b[0]
                                            for b in wblocks)
                STATS["blocks_encoded"] += len(wblocks)
                learner.start_journal()
                enc = encode_wave_blocks(learner, arg, batch)
                journal = learner.pop_journal()
            if needs_sync:
                jblob = journal_dumps(journal)
            round_pay[owner] = b"".join(
                struct.pack("<I", len(blk)) + blk for blk, _bt in enc)
        if needs_sync and num_processes > 1:
            from fqzcomp5_tpu.parallel.distributed import \
                _allgather_bytes

            blobs = _allgather_bytes(jblob)
            if owner != process_id:
                _tick_wave(learner, len(wblocks),
                           journal_loads(blobs[owner]))
                STATS["blocks_ticked"] += len(wblocks)
        elif owner != process_id:
            _tick_wave(learner, len(wblocks), [])
            STATS["blocks_ticked"] += len(wblocks)
        round_meta[owner] = [(b[3], b[2]) for b in wblocks]
        if (w + 1) % num_processes == 0:
            flush_round()
    flush_round()

    if process_id == 0:
        index_offset = out_fp.tell()
        container.write_index(out_fp, idx)
        container.patch_index_offset(out_fp, index_offset)
