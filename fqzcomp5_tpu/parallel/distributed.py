"""Multi-process (multi-host analog) encode over jax.distributed.

The reference's whole parallelism story is one thread pool feeding
serial-ordered results to a single writer (thread_pool.c:113-164 ->
fqzcomp5.c:3063-3120).  The distributed analog here:

- every process runs `jax.distributed.initialize` (gRPC coordinator —
  the DCN-analog control plane) and parses the input identically, so
  block boundaries and serials agree everywhere;
- blocks round-robin by serial: process p owns serials with
  `serial % num_processes == p`;
- the method-learning state machine must evolve identically on every
  process (it is shared mutable state in the reference, guarded by
  metric_m).  Blocks where any section is in trial — or where a
  review re-opens — are encoded REDUNDANTLY by all processes (the
  payload is deterministic, so the learners stay in lock-step);
  locked blocks advance the other processes' learners with bare
  methods_for calls, no codec work;
- per round of num_processes blocks, payloads all-gather to every
  process (jax.experimental.multihost_utils.process_allgather — the
  collective rides the distributed backend), and process 0 writes
  them in serial order and accumulates the index.

Because blocks are model-independent, the output file is byte
-identical to the single-process encoder for any process count
(tests/test_distributed.py proves it with 2 CPU processes).
"""

from __future__ import annotations

import struct
import sys
from typing import BinaryIO

import numpy as np

from fqzcomp5_tpu import container, fastq
from fqzcomp5_tpu.blocks import encode_block
from fqzcomp5_tpu.constants import Section
from fqzcomp5_tpu.learning import MethodLearner
from fqzcomp5_tpu.options import Options, method_avail_for

_SECS = (Section.NAME, Section.SEQ, Section.QUAL)


def init(coordinator: str, num_processes: int, process_id: int) -> None:
    import jax

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def _gather_round(payloads: list[bytes | None], pid: int):
    """All-gather one round's payloads (one owned block per process).
    Processes that own no block this round contribute an empty slot."""
    from jax.experimental import multihost_utils

    mine = payloads[pid] if pid < len(payloads) and \
        payloads[pid] is not None else b""
    sizes = multihost_utils.process_allgather(
        np.array([len(mine)], np.int64))
    sizes = np.asarray(sizes).reshape(-1)
    cap = max(int(sizes.max()), 1)
    buf = np.zeros(cap, np.uint8)
    buf[:len(mine)] = np.frombuffer(mine, np.uint8)
    all_bufs = multihost_utils.process_allgather(buf)
    all_bufs = np.asarray(all_bufs).reshape(len(sizes), cap)
    return [all_bufs[p, :int(sizes[p])].tobytes()
            for p in range(len(sizes))]


def encode_file_distributed(in_path: str, out_fp: BinaryIO | None,
                            arg: Options, *, process_id: int,
                            num_processes: int) -> None:
    """Distributed encode; only process 0 writes to out_fp (pass None
    elsewhere).  Output bytes match the single-process encoder."""
    learner = MethodLearner()
    learner.method_avail = method_avail_for(arg)

    parser = fastq.Parser(fastq.open_input(in_path))
    if process_id == 0:
        container.write_header(out_fp)
    idx = container.FileIndex()

    serial = 0
    round_pay: list[bytes | None] = [None] * num_processes
    round_meta: list[tuple[int, int] | None] = [None] * num_processes

    def flush_round():
        nonlocal round_pay, round_meta
        if not any(m is not None for m in round_meta):
            return
        gathered = _gather_round(round_pay, process_id)
        if process_id == 0:
            for p in range(num_processes):
                if round_meta[p] is None:
                    continue
                usize, nrec = round_meta[p]
                pay = round_pay[p] if round_pay[p] is not None \
                    else gathered[p]
                if not pay:
                    raise RuntimeError(
                        f"missing payload from process {p}")
                idx.add(out_fp.tell(), usize, nrec)
                out_fp.write(pay)
        round_pay = [None] * num_processes
        round_meta = [None] * num_processes

    while True:
        fq = parser.next_batch(arg.blk_size)
        if fq is None or fq.num_records == 0:
            break
        owner = serial % num_processes
        redundant = any(learner.in_trial(s) or learner.will_reopen(s)
                        for s in _SECS)
        if redundant or owner == process_id:
            pay = encode_block(learner, arg, fq)
            if redundant:
                # every process has the identical bytes; the writer
                # uses its own copy, no gather slot needed
                if process_id == 0:
                    round_pay[owner] = pay
            else:
                round_pay[owner] = pay
        else:
            # advance the learner in lock-step without codec work
            # (mirror encode_block's methods_for calls exactly)
            learner.methods_for(Section.NAME)
            learner.methods_for(Section.SEQ)
            if not fq.is_fasta:
                learner.methods_for(Section.QUAL)
        round_meta[owner] = (len(fq.seq_buf), fq.num_records)
        serial += 1
        if serial % num_processes == 0:
            flush_round()
    flush_round()

    if process_id == 0:
        index_offset = out_fp.tell()
        container.write_index(out_fp, idx)
        container.patch_index_offset(out_fp, index_offset)


def decode_file_distributed(in_path: str, out_fp: BinaryIO | None,
                            arg: Options, *, process_id: int,
                            num_processes: int,
                            out_fp2: BinaryIO | None = None,
                            paired: bool | None = None) -> None:
    """Distributed decode: blocks round-robin by serial (no shared
    state — blocks are self-contained), each owner decodes AND formats
    its blocks, and the FASTQ text all-gathers per round to process 0,
    which writes in serial order.  Byte-identical to the
    single-process decoder for any process count.  Pass out_fp2 for
    paired (deinterleaved) output; the two formatted halves travel
    through the gather length-prefixed."""
    import struct as _struct

    from fqzcomp5_tpu.blocks import decode_block
    from fqzcomp5_tpu.drivers import (make_deinterleave_writer,
                                      make_fastq_writer)

    # every process must agree on the format (only process 0 has real
    # file handles), so paired must be passed explicitly off-writer
    if paired is None:
        paired = out_fp2 is not None
    if paired:
        writer = make_deinterleave_writer(out_fp, out_fp2, arg)

        def fmt(fq):
            r1, r2 = writer.format(fq)
            return _struct.pack("<Q", len(r1)) + r1 + r2

        def emit(pay):
            n1 = _struct.unpack("<Q", pay[:8])[0]
            out_fp.write(pay[8:8 + n1])
            out_fp2.write(pay[8 + n1:])
    else:
        writer = make_fastq_writer(out_fp, arg)   # .format: arg only
        fmt = writer.format

        def emit(pay):
            out_fp.write(pay)

    with open(in_path, "rb") as in_fp:
        file_version, index_offset = container.read_header(in_fp)

        serial = 0
        round_pay: list[bytes | None] = [None] * num_processes
        round_has: list[bool] = [False] * num_processes

        def flush_round():
            nonlocal round_pay, round_has
            if not any(round_has):
                return
            gathered = _gather_round(round_pay, process_id)
            if process_id == 0:
                for p in range(num_processes):
                    if not round_has[p]:
                        continue
                    if not gathered[p]:
                        raise RuntimeError(
                            f"missing block text from process {p}")
                    emit(gathered[p])
            round_pay = [None] * num_processes
            round_has = [False] * num_processes

        for raw in container.iter_raw_blocks(in_fp, index_offset):
            owner = serial % num_processes
            if owner == process_id:
                fq = decode_block(raw, file_version)
                round_pay[owner] = fmt(fq)
            round_has[owner] = True
            serial += 1
            if serial % num_processes == 0:
                flush_round()
        flush_round()


def main(argv=None) -> int:
    """Subprocess entry: FQZ5_DIST_COORD / _NPROCS / _PID env vars +
    `python -m fqzcomp5_tpu.parallel.distributed [-d] [-LEVEL]
    [-b SIZE] in out` (out written by process 0 only)."""
    import os

    argv = sys.argv[1:] if argv is None else argv
    coord = os.environ["FQZ5_DIST_COORD"]
    nprocs = int(os.environ["FQZ5_DIST_NPROCS"])
    pid = int(os.environ["FQZ5_DIST_PID"])
    init(coord, nprocs, pid)

    arg = Options()
    files = []
    decode = False
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-d":
            decode = True
        elif a.startswith("-") and len(a) == 2 and a[1].isdigit():
            arg.apply_preset(int(a[1]))
        elif a == "-b":
            i += 1
            arg.blk_size = int(argv[i])
        else:
            files.append(a)
        i += 1
    in_path, out_path = files[0], files[1]
    out2_path = files[2] if len(files) > 2 else None
    arg.verbose = -1

    out_fp = open(out_path, "wb") if pid == 0 else None
    out_fp2 = (open(out2_path, "wb") if pid == 0 and out2_path
               else None)
    try:
        if decode:
            decode_file_distributed(in_path, out_fp, arg,
                                    process_id=pid,
                                    num_processes=nprocs,
                                    out_fp2=out_fp2,
                                    paired=out2_path is not None)
        else:
            encode_file_distributed(in_path, out_fp, arg,
                                    process_id=pid,
                                    num_processes=nprocs)
    finally:
        for f in (out_fp, out_fp2):
            if f:
                f.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
