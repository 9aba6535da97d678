"""TPU-engine file pipelines: wave-batched block compression.

Blocks are gathered into waves; every wave's seq and qual sections walk
the device together (engine_tpu batched rANS order-0 + order-1), and
the smaller result wins per section — batching makes the reference's
"trial" phase free, so every block gets the full method comparison
instead of fqzcomp5's lock-in after 3 blocks.  Names/lengths (small,
pointer-heavy codecs) stay on the host.

Files written here are fully FQZ5-compatible: sections carry ordinary
rANS order bytes (X32 variants) that the reference binary decodes.
Output differs from reference-encoded bytes only in which method each
section selected.
"""

from __future__ import annotations

import struct
import zlib
from typing import BinaryIO

import numpy as np

from fqzcomp5_tpu import container, fastq
from fqzcomp5_tpu import names as names_mod
from fqzcomp5_tpu import varint
from fqzcomp5_tpu.blocks import decode_block
from fqzcomp5_tpu.codecs import host
from fqzcomp5_tpu.constants import Method, Section, VERS_V11
from fqzcomp5_tpu.drivers import Timings
from fqzcomp5_tpu.engine_tpu import (decode_o0_batch, decode_o1_batch,
                                     encode_o0_batch, encode_o1_batch)
from fqzcomp5_tpu.learning import MethodLearner
from fqzcomp5_tpu.options import Options, method_avail_for

WAVE = 8            # blocks per device wave
MIN_DEVICE = 4096   # sections smaller than this stay on the host


def _frame(order: int, data_len: int, payload: bytes) -> bytes:
    return bytes([order]) + varint.put_u32(data_len) + payload


def _device_section_encode(datas: list[bytes]) -> list[bytes]:
    """Best-of {O0, O1} x32 framed streams for many sections."""
    big_idx = [i for i, d in enumerate(datas) if len(d) >= MIN_DEVICE]
    out: list[bytes] = [b""] * len(datas)
    big = set(big_idx)
    for i, d in enumerate(datas):
        if i not in big:
            out[i] = host.rans_compress(d, 1)  # tiny sections: host O1
    if big_idx:
        subset = [datas[i] for i in big_idx]
        enc0 = encode_o0_batch(subset)
        enc1 = encode_o1_batch(subset)
        for k, i in enumerate(big_idx):
            d = datas[i]
            cands = [(len(enc0[k]), 0x04, enc0[k]),
                     (len(enc1[k]), 0x05, enc1[k])]
            cands.sort(key=lambda c: c[0])
            clen, order, payload = cands[0]
            if clen >= len(d):  # CAT fallback (dispatcher rule)
                out[i] = _frame(0x20, len(d), d)
            else:
                out[i] = _frame(order, len(d), payload)
    return out


def encode_stream_tpu(batches, out_fp: BinaryIO, arg: Options,
                      t: Timings) -> None:
    container.write_header(out_fp)
    idx = container.FileIndex()
    learner = MethodLearner()
    learner.method_avail = method_avail_for(arg)

    def flush_wave(wave: list[fastq.FastqBatch]):
        if not wave:
            return
        seqs = _device_section_encode([fq.seq_buf for fq in wave])
        quals = _device_section_encode(
            [fq.qual_buf for fq in wave if not fq.is_fasta])
        qi = 0
        for w, fq in enumerate(wave):
            out = bytearray()
            out += struct.pack("<I", 0)
            out += struct.pack("<I", fq.num_records)
            out += struct.pack("<I", 0)
            # names: host path (strategy per options)
            from fqzcomp5_tpu.blocks import compress_with_methods
            npay, _, _ = compress_with_methods(
                learner, arg, fq, learner.methods_for(Section.NAME),
                Section.NAME, fq.name_buf)
            out += npay
            if fq.fixed_len:
                v = varint.put_u32(fq.fixed_len)
                out += bytes([len(v)]) + v
            else:
                blob = varint.put_array_u32(fq.lens)
                out += bytes([0]) + struct.pack("<I", len(blob)) + blob
            out += struct.pack("<BII", 0, len(fq.seq_buf),
                               len(seqs[w])) + seqs[w]
            if not fq.is_fasta:
                out += struct.pack("<BII", 0, len(fq.qual_buf),
                                   len(quals[qi])) + quals[qi]
                qi += 1
            else:
                out += struct.pack("<BII", 0, 0, 0)
            crc = zlib.crc32(bytes(out[12:])) & 0xFFFFFFFF
            struct.pack_into("<I", out, 8, crc)
            struct.pack_into("<I", out, 0, len(out) - 4)

            idx.add(out_fp.tell(), len(fq.seq_buf), fq.num_records)
            out_fp.write(bytes(out))
            t.nblock += 1
            t.nusize += len(fq.name_buf)
            t.susize += len(fq.seq_buf)
            t.qusize += len(fq.qual_buf)

    wave: list[fastq.FastqBatch] = []
    for fq in batches:
        if fq is None or fq.num_records == 0:
            break
        wave.append(fq)
        if len(wave) >= WAVE:
            flush_wave(wave)
            wave = []
    flush_wave(wave)

    index_offset = out_fp.tell()
    container.write_index(out_fp, idx)
    container.patch_index_offset(out_fp, index_offset)


def encode_file_tpu(in_path, out_fp: BinaryIO, arg: Options,
                    t: Timings) -> None:
    parser = fastq.Parser(fastq.open_input(in_path))

    def batches():
        while True:
            b = parser.next_batch(arg.blk_size)
            if b is None:
                return
            yield b

    encode_stream_tpu(batches(), out_fp, arg, t)


# ---------------------------------------------------------------------
# Decode: wave-batched device rANS for plain O0/O1 sections.

_PLAIN = {0x00: (0, False), 0x01: (1, False), 0x04: (0, True),
          0x05: (1, True)}


def _is_plain_rans(payload: bytes) -> bool:
    return len(payload) > 0 and payload[0] in _PLAIN


def decode_file_tpu(in_fp: BinaryIO, writer, arg: Options,
                    t: Timings) -> None:
    file_version, index_offset = container.read_header(in_fp)

    wave_raw: list[bytes] = []

    def flush(wave):
        if not wave:
            return
        # decode each block on the host, except plain-rANS seq/qual
        # payloads which run batched on the device
        jobs0, jobs1 = [], []   # (block_idx, section, payload, usize)
        metas = [None] * len(wave)
        for i, raw in enumerate(wave):
            metas[i] = _split_block(raw, file_version)
        for i, m in enumerate(metas):
            for sec in ("seq", "qual"):
                strat, ulen, payload = m[sec]
                if strat == 0 and _is_plain_rans(payload) \
                        and len(payload) > 4:
                    inner = payload[0]
                    _, nb = varint.get_u32(payload, 1)
                    body = payload[1 + nb:]
                    if len(body) < 130:
                        continue  # too small; host path
                    if _PLAIN[inner][0] == 0:
                        jobs0.append((i, sec, body, ulen,
                                      _PLAIN[inner][1]))
                    else:
                        jobs1.append((i, sec, body, ulen,
                                      _PLAIN[inner][1]))
        dev_results = {}
        for jobs, dec in ((jobs0, decode_o0_batch), (jobs1, decode_o1_batch)):
            x32 = [j for j in jobs if j[4]]
            if x32:
                res = dec([j[2] for j in x32], [j[3] for j in x32])
                for j, r in zip(x32, res):
                    dev_results[(j[0], j[1])] = r
        for i, raw in enumerate(wave):
            pre = {k[1]: v for k, v in dev_results.items() if k[0] == i}
            fq = decode_block(raw, file_version, predecoded=pre)
            t.nblock += 1
            writer(fq)

    for raw in container.iter_raw_blocks(in_fp, index_offset):
        wave_raw.append(raw)
        if len(wave_raw) >= WAVE:
            flush(wave_raw)
            wave_raw = []
    flush(wave_raw)


def _split_block(raw: bytes, file_version: int):
    """Parse section boundaries of one serialized block (no decode)."""
    off = 8
    if file_version == VERS_V11:
        off += 4
    m = {}
    (u_len,) = struct.unpack_from("<I", raw, off)
    off += 4
    nstrat = raw[off]
    off += 1
    (c_len,) = struct.unpack_from("<I", raw, off)
    off += 4
    m["names"] = (nstrat, u_len, raw[off:off + c_len])
    off += c_len
    lstrat = raw[off]
    off += 1
    if lstrat > 0:
        _, n = varint.get_u32(raw, off)
        off += n
    else:
        (blen,) = struct.unpack_from("<I", raw, off)
        off += 4 + blen
    for key in ("seq", "qual"):
        strat = raw[off]
        off += 1
        (ulen, clen) = struct.unpack_from("<II", raw, off)
        off += 8
        m[key] = (strat, ulen, raw[off:off + clen])
        off += clen
    return m
