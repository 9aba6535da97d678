"""Read-name section codec: the 3-strategy wrapper.

Wire-compatible with encode_names/decode_names (fqzcomp5.c:1408-1794):

strategy 0: LZP, then rANS order 5 (O1|X32)
strategy 1: tok3 over the whole name block
strategy 2: names split into ID + flags + comment streams --
            ID via tok3, per-record flag bytes via rANS order 129,
            comments via LZP + rANS order 5.

Framing: [u32 ulen][u8 strat][u32 clen][payload]; strategy 2's payload
is [u32 clen1][u32 clenf][tok3][flags][comments].
"""

from __future__ import annotations

import struct

import numpy as np

from fqzcomp5_tpu.codecs import host
from fqzcomp5_tpu.constants import FQZ_FREAD2


def encode_names(name_buf: bytes, strat: int, level: int) -> bytes:
    ulen = len(name_buf)
    if strat == 0:
        lz = host.lzp(name_buf)
        comp = host.rans_compress(lz, 5)
        return struct.pack("<IBI", ulen, 0, len(comp)) + comp

    if strat == 1:
        comp = host.tok3_encode(name_buf, level, 0)
        return struct.pack("<IBI", ulen, 1, len(comp)) + comp

    # strategy 2: split ID / flag / comment
    ids = bytearray()
    comments = bytearray()
    flags = bytearray()
    comment_pad: list[int] = []  # records lacking a comment
    i = 0
    n = len(name_buf)
    while i < n:
        j = name_buf.find(b"\x00", i)
        if j < 0:
            j = n
        name = name_buf[i:j]
        f = 0
        w1end = len(name)
        w2start = -1
        for k, ch in enumerate(name):
            if ch == 0x20 or ch == 0x09:  # space or tab
                w1end = k
                w2start = k + 1
                f |= 4
                break
        if w2start >= 0:
            f |= 0 if name[w2start - 1] == 0x20 else 8
        if w1end > 1 and name[w1end - 2] == ord("/"):
            if name[w1end - 1] == ord("1"):
                f |= 1
                w1end -= 2
            elif name[w1end - 1] == ord("2"):
                f |= 3
                w1end -= 2
        flags.append(f)
        ids += name[:w1end]
        ids.append(0)
        if w2start >= 0:
            comments += name[w2start:]
            comments.append(0)
        else:
            # NB deviation from the reference encoder: it emits nothing
            # here, but its decoder consumes one comment entry per
            # record whenever a comment stream exists, corrupting
            # mixed comment/no-comment blocks (fqzcomp5.c:1745-1749).
            # An explicit empty entry keeps alignment and decodes
            # correctly under both decoders.
            comment_pad.append(len(flags) - 1)
        i = j + 1

    if comments and comment_pad:
        # rebuild with explicit empty entries in record order
        parts = []
        ci = 0
        csplit = bytes(comments).split(b"\x00")[:-1]
        pad = set(comment_pad)
        for r in range(len(flags)):
            if r in pad:
                parts.append(b"")
            else:
                parts.append(csplit[ci])
                ci += 1
        comments = bytearray(b"\x00".join(parts) + b"\x00")

    out1 = host.tok3_encode(bytes(ids), level, 0)
    outf = host.rans_compress(bytes(flags), 129)
    out2 = b""
    if comments:
        lz = host.lzp(bytes(comments))
        out2 = host.rans_compress(lz, 5)

    clen = len(out1) + len(outf) + len(out2) + 8
    return (struct.pack("<IBI", ulen, 2, clen)
            + struct.pack("<II", len(out1), len(outf))
            + out1 + outf + out2)


def decode_names(comp: bytes, c_len: int, u_len: int, strat: int):
    """Returns (name_buf, flags_or_None).

    flags (per record, FQZ_FREAD2 semantics) are only recovered for
    strategy 2; the caller re-derives them from names otherwise
    (decode_block, fqzcomp5.c:2334-2374).
    """
    if strat == 0:
        rout = host.rans_uncompress(comp)
        return host.unlzp(rout, u_len), None
    if strat == 1:
        return host.tok3_decode(comp), None

    clen1, clenf = struct.unpack_from("<II", comp, 0)
    if c_len < clen1 + clenf + 8:
        raise ValueError("invalid strat-2 name payload")
    clen2 = c_len - clen1 - clenf - 8
    out1 = host.tok3_decode(comp[8:8 + clen1])
    outf = host.rans_uncompress(comp[8 + clen1:8 + clen1 + clenf])
    out2 = b""
    if clen2:
        rout = host.rans_uncompress(comp[8 + clen1 + clenf:
                                         8 + clen1 + clenf + clen2])
        out2 = host.unlzp(rout, u_len)

    # Reference decode semantics (fqzcomp5.c:1722-1760): one ID per
    # record; a comment entry is consumed for EVERY record whenever a
    # comment stream exists (appended without separator if flag bit 2
    # is unset -- only reachable on reference-encoded mixed blocks).
    ids = out1.split(b"\x00")[:-1] if out1 else []
    comments = out2.split(b"\x00") if out2 else []
    nrec = len(ids)
    parts = []
    flags = np.zeros(max(nrec, len(outf)), np.uint32)
    ci = 0
    for r in range(nrec):
        f = outf[r] if r < len(outf) else 0
        nm = bytearray(ids[r])
        if f & 1:
            nm += b"/2" if f & 2 else b"/1"
        if f & 4:
            nm += b"\t" if f & 8 else b" "
        if comments:
            if ci < len(comments):
                nm += comments[ci]
                ci += 1
        parts.append(bytes(nm))
        flags[r] = FQZ_FREAD2 if (f & 3) == 3 else 0
    name_buf = b"\x00".join(parts) + (b"\x00" if parts else b"")
    return name_buf, flags[:nrec]
