"""Host rANS kernel micro-bench (our native libfqz5 side).

Times the raw C calls fqz5_rans_compress / fqz5_rans_uncompress via
ctypes on a data file, best-of-N, matching tools/oracle-linked
kbench.c on the reference side (same file, same order, same
preallocated-output discipline) so the two JSON lines compare
like-for-like.  Buffer setup, pointer marshalling and the roundtrip
check all happen OUTSIDE the timed region — kbench times
rans_compress_to_4x16/rans_uncompress_to_4x16 only, so timing our
Python-side .tobytes() copy (23 MB on the DNA payload) would charge
us ~2-3 ms/rep the reference side never pays.

Usage:

    python tools/host_kernel_bench.py <file> <order-int-or-hex> <reps>

Reference counterpart: htscodecs/rANS_static4x16pr.c (dispatcher),
rANS_static32x16pr_avx2.c / avx512.c (X_32 cores).
"""
import ctypes
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from fqzcomp5_tpu.codecs import native


def main():
    path, order_s, reps_s = sys.argv[1:4]
    order = int(order_s, 0)
    reps = int(reps_s)
    with open(path, "rb") as f:
        data = f.read()

    L = native.lib()
    n = len(data)
    src = np.frombuffer(data, np.uint8)
    src_p = src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    stripe_n = (order >> 8) & 0xFF or 4
    ccap = int(1.05 * n) + 257 * 257 * 3 + 1024 + 5 * stripe_n + 128
    cbuf = np.empty(ccap, np.uint8)
    cbuf_p = cbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    benc = 1e9
    csz = -1
    for _ in range(reps):
        t0 = time.perf_counter()
        csz = L.fqz5_rans_compress(src_p, n, order, cbuf_p, ccap)
        benc = min(benc, time.perf_counter() - t0)
    if csz < 0:
        raise ValueError(f"rans_compress failed (order={order:#x})")

    obuf = np.empty(n + 64, np.uint8)
    obuf_p = obuf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    bdec = 1e9
    dsz = -1
    for _ in range(reps):
        t0 = time.perf_counter()
        dsz = L.fqz5_rans_uncompress(cbuf_p, csz, obuf_p, n + 64, n, 1)
        bdec = min(bdec, time.perf_counter() - t0)
    assert dsz == n and obuf[:n].tobytes() == data, "roundtrip mismatch"

    print(json.dumps({
        "side": "ours", "order": hex(order), "n": n,
        "csz": int(csz),
        "enc_MBps": round(n / benc / 1e6, 1),
        "dec_MBps": round(n / bdec / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
