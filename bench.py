"""Benchmark: batched 32-lane rANS order-0 encode pipeline on device.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's code-embedded scalar 32x16 O0 encode speed of
328 MB/s (htscodecs/rANS_static32x16pr.c:169-175, gcc11).

Methodology.  This host reaches its TPU through a high-latency tunnel
(~40ms/call, ~5MB/s host<->device), so a single call's wall clock
measures the tunnel, not the chip.  The benchmark therefore:
- keeps all data device-resident (symbols generated on device; only the
  257-entry tables and a checksum cross the tunnel),
- performs the full device pipeline per call: one-hot/MXU expansion of
  per-symbol table values, then the reverse rANS state walk over a
  (B*32)-lane vector with emitted-word planes reduced to a checksum,
- times two scan lengths and reports marginal throughput
  (extra bytes / extra time) — the steady-state device rate.
"""

import functools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fqzcomp5_tpu.ops import rans_jax

    rng = np.random.default_rng(42)
    B = 512               # independent streams (blocks x sections)
    T1, T2 = 512, 2048    # scan lengths for marginal timing
    L = B * 32
    NSYM = 46             # SRR1238539-like quality alphabet

    freqs = np.zeros(256, np.uint32)
    freqs[:NSYM] = 4096 // NSYM
    freqs[0] += 4096 - freqs.sum()
    tabs = rans_jax.build_enc_tables(freqs, 12)
    # (257, 5) table, u32 split into u8 planes for exact bf16 matmul
    tab5 = np.stack([np.concatenate([t, [0]]) for t in tabs], axis=-1)
    tab5[256] = [0xFFFFFFFF, 0, 0, 0, 0]
    planes = np.stack([(tab5 >> (8 * p)) & 0xFF for p in range(4)],
                      axis=-1).reshape(257, 20).astype(np.float32)

    @functools.partial(jax.jit, static_argnames=("T",))
    def pipeline(key, planes_dev, T):
        syms = jax.random.randint(key, (T, L), 0, NSYM)
        oh = jax.nn.one_hot(syms, 257, dtype=jnp.bfloat16)
        v = jnp.einsum("tls,sk->tlk", oh, planes_dev.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        v = v.astype(jnp.uint32).reshape(T, L, 5, 4)
        v32 = (v[..., 0] | (v[..., 1] << 8) | (v[..., 2] << 16)
               | (v[..., 3] << 24))

        def step(R, vt):
            xm = vt[:, 0]
            rcp = vt[:, 1]
            sh = vt[:, 2]
            bias = vt[:, 3]
            cmpl = vt[:, 4]
            emit = R > xm
            word = R & 0xFFFF
            R = jnp.where(emit, R >> 16, R)
            a0 = R & 0xFFFF
            a1 = R >> 16
            b0 = rcp & 0xFFFF
            b1 = rcp >> 16
            m0 = a0 * b0
            m1 = a1 * b0 + (m0 >> 16)
            m2 = a0 * b1
            q_ = (a1 * b1 + (m1 >> 16) + (m2 >> 16)
                  + (((m1 & 0xFFFF) + (m2 & 0xFFFF)) >> 16)) >> sh
            R = R + bias + q_ * cmpl
            return R, word & (emit * 0xFFFF)

        R0 = jnp.full((L,), rans_jax.RANS_L, jnp.uint32)
        Rf, ws = jax.lax.scan(step, R0, v32, reverse=True)
        return jnp.sum(Rf, dtype=jnp.uint32) + jnp.sum(ws, dtype=jnp.uint32)

    planes_dev = jax.device_put(planes)
    key = jax.random.PRNGKey(0)

    def run(T):
        return int(np.asarray(pipeline(key, planes_dev, T)))

    run(T1)
    run(T2)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        run(T1)
    dt1 = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        run(T2)
    dt2 = (time.perf_counter() - t0) / reps

    marginal = (B * (T2 - T1) * 32) / max(dt2 - dt1, 1e-9)
    mbps = marginal / 1e6
    baseline = 328.0
    print(json.dumps({
        "metric": "rans32x16_o0_encode_pipeline_throughput",
        "value": round(mbps, 1),
        "unit": "MB/s",
        "vs_baseline": round(mbps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
