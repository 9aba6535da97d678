"""Helper to invoke the reference codec oracle when present.

The oracle harness (a thin CLI over the *reference* htscodecs build,
living outside this repo) is used for byte-parity assertions during
development.  Tests that need it are skipped when it's unavailable so
the suite stays green on clean checkouts.
"""
import pathlib
import shutil
import struct
import subprocess

ORACLE = pathlib.Path("/tmp/oracle/harness/codec_oracle")
FQZ5_BIN = pathlib.Path("/tmp/oracle/fqzcomp5")


def have_oracle() -> bool:
    return ORACLE.exists()


def run(cmd: list[str], data: bytes) -> bytes:
    p = subprocess.run([str(ORACLE)] + cmd, input=data,
                       capture_output=True, check=True)
    return p.stdout


def rans_enc(data: bytes, order: int) -> bytes:
    return run(["rans_enc", str(order)], data)


def rans_dec(data: bytes) -> bytes:
    return run(["rans_dec"], data)


def lzp_enc(data: bytes) -> bytes:
    return run(["lzp_enc"], data)


def lzp_dec(ulen: int, data: bytes) -> bytes:
    return run(["lzp_dec"], struct.pack("<I", ulen) + data)


def arith_enc(data: bytes, order: int) -> bytes:
    return run(["arith_enc", str(order)], data)


def arith_dec(data: bytes) -> bytes:
    return run(["arith_dec"], data)


def tok3_enc(data: bytes, level: int, use_arith: int) -> bytes:
    return run(["tok3_enc", str(level), str(use_arith)], data)


def tok3_dec(data: bytes) -> bytes:
    return run(["tok3_dec"], data)


def fqz_enc(lens, flags, qual: bytes, strat: int) -> bytes:
    import numpy as np
    hdr = struct.pack("<I", len(lens))
    hdr += np.asarray(lens, np.uint32).tobytes()
    hdr += np.asarray(flags, np.uint32).tobytes()
    return run(["fqz_enc", str(strat)], hdr + qual)


def fqz_dec(data: bytes) -> bytes:
    return run(["fqz_dec"], data)
