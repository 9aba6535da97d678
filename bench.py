"""Benchmark: batched 32-lane rANS order-0 encode throughput on device.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's code-embedded scalar 32x16 O0 encode speed of
328 MB/s (htscodecs/rANS_static32x16pr.c:169-175, gcc11).

The workload is SRR1238539-shaped quality data (the primary parity
target per BASELINE.json): B independent streams x T scan steps x 32
lanes, the data-parallel batched formulation the TPU engine uses for
multi-block encode.
"""

import json
import time

import numpy as np


def main():
    import jax

    from fqzcomp5_tpu.ops import rans_jax

    rng = np.random.default_rng(42)
    B, T = 64, 8192  # 64 streams x 256KB = 16MB per launch
    nbytes = B * T * 32

    # IonTorrent-like quality distribution (SRR1238539 shape)
    q = np.clip(rng.normal(28, 7, nbytes), 0, 45).astype(np.uint8)
    syms = q.reshape(B, T, 32).astype(np.int32)

    freqs = np.zeros((B, 256), np.uint32)
    hist = np.bincount(q, minlength=256).astype(np.float64)
    scaled = np.maximum((hist / hist.sum() * 4096).astype(np.uint32),
                        (hist > 0).astype(np.uint32))
    # cheap normalisation for benchmarking (table prep isn't timed)
    diff = 4096 - scaled.sum()
    scaled[int(np.argmax(scaled))] += diff
    freqs[:] = scaled
    tables = rans_jax.build_enc_tables(freqs, rans_jax.TF_SHIFT)

    dev_args = [jax.device_put(a) for a in (syms,) + tables]

    def run():
        Rf, w, m = rans_jax.encode_scan(*dev_args, rans_jax.TF_SHIFT)
        jax.block_until_ready(Rf)
        return Rf

    run()  # compile
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps

    mbps = nbytes / dt / 1e6
    baseline = 328.0  # MB/s, reference scalar encoder
    print(json.dumps({
        "metric": "rans32x16_o0_encode_throughput",
        "value": round(mbps, 1),
        "unit": "MB/s",
        "vs_baseline": round(mbps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
