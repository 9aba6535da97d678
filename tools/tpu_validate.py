"""Hardware validation + measurement for the Pallas kernels (v5e).

Appends results to /tmp/tpu_results.txt; retries through tunnel flaps.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open("/tmp/tpu_results.txt", "a") as f:
        f.write(line + "\n")


def wait_tpu():
    import subprocess
    import sys
    for attempt in range(480):
        # probe in a SUBPROCESS: a half-up tunnel can HANG backend
        # init, and a failed init is cached per process
        try:
            # in-process retries matter: the plugin's first attempts
            # fail/hang but later attempts in the SAME process can
            # connect (that is how bench.py got through)
            r = subprocess.run(
                [sys.executable, "-c",
                 "import time\n"
                 "import jax\n"
                 "for i in range(8):\n"
                 "    try:\n"
                 "        assert jax.default_backend() == 'tpu'\n"
                 "        import jax.numpy as jnp\n"
                 "        print(float(jax.jit(lambda x: x + 1)(jnp.float32(1))))\n"
                 "        break\n"
                 "    except (RuntimeError, AssertionError) as e:\n"
                 "        time.sleep(15)\n"
                 "else:\n"
                 "    raise SystemExit(3)\n"],
                capture_output=True, timeout=500)
            if r.returncode == 0:
                log("probe subprocess ok; initialising in-process")
                return True
            log(f"probe rc={r.returncode}: "
                f"{r.stderr.decode()[-120:]}; retry {attempt}")
        except subprocess.TimeoutExpired:
            log(f"probe subprocess hang (tunnel half-up); retry {attempt}")
        time.sleep(30)
    return False


def main():
    if not wait_tpu():
        log("tpu never came up; giving up")
        return 1
    import jax
    import jax.numpy as jnp
    for attempt in range(30):
        try:
            assert jax.default_backend() == "tpu"
            float(jax.jit(lambda x: x + 1)(jnp.float32(1)))
            log("main process on tpu")
            break
        except (RuntimeError, AssertionError) as e:
            log(f"main init retry {attempt}: {str(e)[:80]}")
            time.sleep(15)
    else:
        log("main process never initialised; giving up")
        return 1
    from fqzcomp5_tpu.ops import backend, rans_jax
    from fqzcomp5_tpu.ops import rans_pallas_dec as rpd
    backend.ensure_compile_cache()

    shift = 12
    rng = np.random.default_rng(0)

    def setup(B, T, NSYM, S):
        B4 = B // 4
        freqs = np.zeros((B, 256), np.uint32)
        freqs[:, :NSYM] = 4096 // NSYM
        freqs[:, 0] += 4096 - freqs[0].sum()
        syms = rng.integers(0, NSYM, (B, T, 32)).astype(np.int32)
        Rf, words, mask = backend.encode_flat(syms, freqs, shift)
        Wmax128 = max((T * 32) // 128 + 4, 4)
        wordsA = np.zeros((B, Wmax128, 128), np.int32)
        R0 = np.zeros((B, 32), np.int32)
        for b in range(B):
            stream = rans_jax.assemble_o0_stream(Rf[b], words[b], mask[b])
            R0[b] = np.frombuffer(stream[:128], "<u4").astype(np.int32)
            wb = np.frombuffer(stream[128:] + b"\x00" * (len(stream) & 1),
                               "<u2").astype(np.int32)
            flat = np.zeros(Wmax128 * 128, np.int32)
            flat[:len(wb)] = wb
            wordsA[b] = flat.reshape(Wmax128, 128)
        tab = (rpd.build_dec_tables_p(freqs, shift, S) if S <= 64
               else rpd.build_dec_tables(freqs, shift, S))
        cexp = np.ascontiguousarray(rpd.expand4(tab).transpose(1, 0, 2))
        f0exp = rpd.expand4(freqs[:, :1].astype(np.int32))[:, 0, :]
        treal = np.full(B, T, np.int32)
        texp = rpd.expand4(treal.reshape(-1, 1))[:, 0, :].astype(np.int32)
        R0p = R0.reshape(B4, 128).astype(np.int32)
        dev = [jax.device_put(jnp.asarray(x))
               for x in (wordsA, cexp, f0exp, R0p, texp)]
        return dev, syms

    def mk_run(walk, S):
        @functools.partial(jax.jit, static_argnames=("T",))
        def run(words, cexp, f0exp, R0p, texp, T):
            syms, Rf = walk(words, cexp, f0exp, R0p, texp,
                            T=T, shift=shift, S=S)
            return syms, Rf
        return run

    results = {}
    for S, NSYM in ((64, 46), (16, 5)):
        B = 256
        T1, T2 = 2048, 8192
        args = {}
        ref = {}
        for T in (T1, T2):
            args[T], ref[T] = setup(B, T, NSYM, S)
        for name, walk in (("v5", rpd.decode_walk4v5),
                           ("v3", rpd.decode_walk4v3)):
            run = mk_run(walk, S)
            try:
                # correctness first (hardware-only bugs!)
                syms_d, _ = run(*args[T1], T=T1)
                got = np.asarray(syms_d)  # (T, B4, 128)
                want = ref[T1]            # (B, T, 32)
                ok = True
                for b in range(0, B, 37):
                    sl = slice((b % 4) * 32, (b % 4) * 32 + 32)
                    if not np.array_equal(got[:, b // 4, sl],
                                          want[b]):
                        ok = False
                        break
                if not ok:
                    log(f"{name} S={S}: HARDWARE MISMATCH stream {b}")
                    continue
                # marginal timing
                def bench(T, n=6):
                    b_ = 1e9
                    for _ in range(n):
                        t0 = time.perf_counter()
                        s, r = run(*args[T], T=T)
                        float(s[0, 0, 0].astype(jnp.float32))
                        jax.block_until_ready((s, r))
                        b_ = min(b_, time.perf_counter() - t0)
                    return b_
                for T in (T1, T2):
                    bench(T, n=2)  # warm
                tA, tB = bench(T1), bench(T2)
                mbps = B * 32 * (T2 - T1) / max(tB - tA, 1e-9) / 1e6
                log(f"{name} S={S} B={B}: {mbps:.0f} MB/s "
                    f"(tA={tA*1e3:.1f}ms tB={tB*1e3:.1f}ms) correct=OK")
                results[(name, S)] = mbps
            except Exception as e:
                log(f"{name} S={S}: FAILED {str(e)[:300]}")
                import re
                mm = re.findall(r"(Mosaic failed[^\n]*|error:[^\n]*)",
                                str(e))
                for x in mm[:4]:
                    log("  " + x[:200])
    log(f"SUMMARY {results}")


    # ---- O1 decode walk: v5 vs v3 (DNA-like, A small) ----------
    try:
        import ctypes
        from fqzcomp5_tpu import engine_tpu
        L = engine_tpu._lib()
        _u32p = ctypes.POINTER(ctypes.c_uint32)

        def setup_o1(B, T):
            motif = rng.choice(list(b"ACGT"), 48).astype(np.uint8)
            datas = []
            for _ in range(B):
                n = T * 32
                reps = np.tile(motif, n // 48 + 1)[:n].copy()
                fl = rng.integers(0, n, n // 9)
                reps[fl] = rng.choice(list(b"ACGT"), len(fl))
                datas.append(reps.tobytes())
            payloads = engine_tpu.encode_o1_batch(datas)
            parsed = []
            for p in payloads:
                arr = np.frombuffer(p, np.uint8)
                shift_c = ctypes.c_int(0)
                s3 = np.empty(256 << 12, np.uint32)
                used = L.fqz5_rans_o1_dec_prep(
                    engine_tpu._ptr(arr), len(arr),
                    s3.ctypes.data_as(_u32p), ctypes.byref(shift_c))
                assert used > 0
                parsed.append((shift_c.value,
                               s3[:256 << shift_c.value], arr[used:]))
            shift_g = parsed[0][0]
            assert all(p[0] == shift_g for p in parsed)
            tot = 1 << shift_g
            s3s = np.stack([p[1] for p in parsed])
            from fqzcomp5_tpu.ops import rans_pallas_dec as rpd
            s3m = s3s.reshape(B, 256, tot)
            sym_lut = (s3m & 0xFF).astype(np.int64)
            f_lut = (s3m >> (shift_g + 8)).astype(np.uint32)
            freqs = np.zeros((B, 256, 256), np.uint32)
            gi = np.arange(B)[:, None, None]
            ci = np.arange(256)[None, :, None]
            freqs[gi, ci, sym_lut] = f_lut
            packed, alphabet, A, A1, last0 = \
                rpd.build_o1_dense_tables(freqs, shift_g)
            Wmax = max((len(p[2]) - 128 + 1) // 2 for p in parsed)
            Wmax128 = Wmax // 128 + 4
            words128 = np.zeros((B, Wmax128, 128), np.int32)
            R0 = np.zeros((B, 32), np.int32)
            for g, p in enumerate(parsed):
                body = p[2]
                R0[g] = body[:128].copy().view("<u4").astype(np.int32)
                wb = body[128:]
                if len(wb) & 1:
                    wb = np.concatenate([wb, np.zeros(1, np.uint8)])
                w16 = wb.copy().view("<u2").astype(np.int32)
                flat = np.zeros(Wmax128 * 128, np.int32)
                flat[:len(w16)] = w16
                words128[g] = flat.reshape(Wmax128, 128)
            cexp = np.ascontiguousarray(
                rpd.expand4(packed).transpose(1, 0, 2))
            treal = np.full(B, T, np.int32)
            texp = rpd.expand4(
                treal.reshape(-1, 1))[:, 0, :].astype(np.int32)
            R0r = R0.reshape(B // 4, 128)
            dev = [jax.device_put(jnp.asarray(x))
                   for x in (words128, cexp, R0r, texp)]
            return dev, (shift_g, A, A1, last0)

        from fqzcomp5_tpu.ops import rans_pallas_dec as rpd
        B = 256
        T1o, T2o = 1024, 4096
        a1, m1 = setup_o1(B, T1o)
        a2, m2 = setup_o1(B, T2o)
        assert m1 == m2, (m1, m2)
        shift_g, A, A1, last0 = m1
        log(f"O1 setup: shift={shift_g} A={A} A1={A1}")
        for name, walk in (("v5", rpd.decode_walk4v5_o1),
                           ("v3", rpd.decode_walk4v3_o1)):
            try:
                def run(args, T):
                    syms, Rf, cur = walk(*args, T=T, shift=shift_g,
                                         A=A, A1=A1, last0=last0)
                    jax.block_until_ready((syms, Rf, cur))
                    return float(syms[0, 0, 0].astype(jnp.float32))
                run(a1, T1o); run(a2, T2o)
                def best(args, T, n=5):
                    b_ = 1e9
                    for _ in range(n):
                        t0 = time.perf_counter()
                        run(args, T)
                        b_ = min(b_, time.perf_counter() - t0)
                    return b_
                tA, tB = best(a1, T1o), best(a2, T2o)
                mbps = B * 32 * (T2o - T1o) / max(tB - tA, 1e-9) / 1e6
                log(f"O1 dec {name} A={A}: {mbps:.0f} MB/s "
                    f"(tA={tA*1e3:.1f} tB={tB*1e3:.1f})")
            except Exception as e:
                log(f"O1 dec {name} FAILED {str(e)[:250]}")
    except Exception as e:
        log(f"O1 setup FAILED {str(e)[:250]}")

    # ---- pass-3 rc walk: pallas vs scan ------------------------
    try:
        from fqzcomp5_tpu.ops import rc_jax, rc_pallas
        R = 4
        T1, T2 = 2048, 8192
        planes = {}
        scanargs = {}
        for T in (T1, T2):
            tot = rng.integers(2, 60000, (R * 128, T)).astype(np.uint32)
            fq = (rng.random((R * 128, T)) * tot * 0.9).astype(np.uint32) + 1
            fq = np.minimum(fq, tot)
            cm = (rng.random((R * 128, T)) * (tot - fq)).astype(np.uint32)
            P0 = ((cm << 16) | fq).reshape(R, 128, T).transpose(2, 0, 1)
            P1 = (((1 << 16) | tot)).reshape(R, 128, T).transpose(2, 0, 1)
            planes[T] = tuple(jax.device_put(jnp.asarray(
                np.ascontiguousarray(x).view(np.int32))) for x in (P0, P1))
            scanargs[T] = tuple(jax.device_put(jnp.asarray(x))
                                for x in (cm, fq, tot))
        z = np.zeros((R, 128), np.int32)
        s0 = [jax.device_put(jnp.asarray(x)) for x in (z, z - 1, z, z, z)]

        def run_pallas(T):
            outs = rc_pallas._rc_call(*planes[T], s0, T=T)
            jax.block_until_ready(outs)
            return float(outs[4][0, 0].astype(jnp.float32))

        def run_scan(T):
            st, evs = rc_jax.encode_scan(*scanargs[T])
            jax.block_until_ready(st)
            return float(st[0][0].astype(jnp.float32))

        # hardware correctness first: assemble a small pallas walk and
        # compare against the scan path byte-for-byte
        try:
            Tsm = 2048
            tot = rng.integers(2, 60000, (8, Tsm)).astype(np.uint32)
            fq2 = (rng.random((8, Tsm)) * tot * 0.9).astype(np.uint32) + 1
            fq2 = np.minimum(fq2, tot)
            cm2 = (rng.random((8, Tsm)) * (tot - fq2)).astype(np.uint32)
            stp, (flp, cap_, ffp, cyp) = rc_pallas.encode_walk(
                cm2, fq2, tot)
            sts, (fls, cas, ffs, cys) = rc_jax.encode_scan(
                cm2, fq2, tot)
            fls, cas, ffs, cys = map(np.asarray, (fls, cas, ffs, cys))
            ok = True
            for b in range(8):
                got = rc_jax.assemble_stream(flp[b], cap_[b], ffp[b],
                                             cyp[b], b"")
                want = rc_jax.assemble_stream(fls[b], cas[b], ffs[b],
                                              cys[b], b"")
                if got != want:
                    ok = False
                    break
            stf_ok = all(np.array_equal(np.asarray(a, np.uint32),
                                        np.asarray(b_, np.uint32))
                         for a, b_ in zip(stp, sts))
            log(f"pass3 pallas HW parity: streams={'OK' if ok else 'MISMATCH'} state={'OK' if stf_ok else 'MISMATCH'}")
        except Exception as e:
            log(f"pass3 parity check FAILED {str(e)[:250]}")

        for name, run in (("pallas", run_pallas), ("scan", run_scan)):
            try:
                for T in (T1, T2):
                    run(T)
                def best(T, n=5):
                    b = 1e9
                    for _ in range(n):
                        t0 = time.perf_counter()
                        run(T)
                        b = min(b, time.perf_counter() - t0)
                    return b
                tA, tB = best(T1), best(T2)
                sps = R * 128 * (T2 - T1) / max(tB - tA, 1e-9) / 1e6
                log(f"pass3 {name}: {sps:.0f} Msym/s (tA={tA*1e3:.1f} tB={tB*1e3:.1f})")
            except Exception as e:
                log(f"pass3 {name} FAILED {str(e)[:250]}")
    except Exception as e:
        log(f"pass3 setup FAILED {str(e)[:250]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

