"""Host rANS kernel micro-bench (our native libfqz5 side).

Times fqz5_rans_compress / fqz5_rans_uncompress via ctypes on a data
file, best-of-N, matching tools/oracle-linked kbench.c on the
reference side (same file, same order) so the two JSON lines compare
like-for-like.  Usage:

    python tools/host_kernel_bench.py <file> <order-int-or-hex> <reps>

Reference counterpart: htscodecs/rANS_static4x16pr.c (dispatcher),
rANS_static32x16pr_avx2.c / avx512.c (X_32 cores).
"""
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from fqzcomp5_tpu.codecs.native import rans_compress, rans_uncompress


def main():
    path, order_s, reps_s = sys.argv[1:4]
    order = int(order_s, 0)
    reps = int(reps_s)
    with open(path, "rb") as f:
        data = f.read()

    comp = None
    benc = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        comp = rans_compress(data, order)
        benc = min(benc, time.perf_counter() - t0)

    bdec = 1e9
    for r in range(reps):
        t0 = time.perf_counter()
        out = rans_uncompress(comp, len(data))
        bdec = min(bdec, time.perf_counter() - t0)
        if r == 0:
            assert out == data, "roundtrip mismatch"

    print(json.dumps({
        "side": "ours", "order": hex(order), "n": len(data),
        "csz": len(comp),
        "enc_MBps": round(len(data) / benc / 1e6, 1),
        "dec_MBps": round(len(data) / bdec / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
