"""Wave-size sweep for the `-e tpu` engine (docs/WAVE_SIZING.md data).

Encodes one fixed corpus with the device wave engine at several wave
sizes (blocks-per-wave via FQZ5_WAVE_BLOCKS, byte budget pinned high so
the block cap is the binding limit) and records wall, device-compute
and link time per configuration.  Run on real TPU hardware:

    python tools/wave_sweep.py [--mb 6] [--blk 512K]

Each configuration runs in-process twice; the second (warm) wall is
reported so Mosaic/XLA compile time (persistently cached per shape
bucket) is excluded — matching the steady-state regime the default
serves.
"""
import argparse
import io
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=6)
    ap.add_argument("--blk", default=str(512 << 10))
    ap.add_argument("--waves", default="1,2,4,8,16")
    args = ap.parse_args()

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    src = "/tmp/wave_corpus.fastq"
    bench.gen_corpus(src, args.mb)
    n = os.path.getsize(src)
    print(json.dumps({"corpus_bytes": n, "blk": args.blk}), flush=True)

    os.environ["FQZ5_WAVE_MB"] = "100000"  # block cap binds, not bytes
    os.environ["FQZ5_DEVTIME"] = "1"       # link/compute accounting

    from fqzcomp5_tpu.drivers import Timings
    from fqzcomp5_tpu.options import Options
    from fqzcomp5_tpu.ops import devtimer

    ref = None
    for w in (int(x) for x in args.waves.split(",")):
        os.environ["FQZ5_WAVE_BLOCKS"] = str(w)
        # re-import so the module-level WAVE constant picks up the env
        for mod in ("fqzcomp5_tpu.tpu_driver",):
            sys.modules.pop(mod, None)
        from fqzcomp5_tpu import tpu_driver

        from fqzcomp5_tpu.cli import parse_size

        arg = Options()
        arg.apply_preset(1)
        arg.blk_size = parse_size(args.blk)
        arg.verbose = -1
        walls = []
        for rep in range(2):
            devtimer.reset()
            out = io.BytesIO()
            t0 = time.perf_counter()
            tpu_driver.encode_file_tpu(src, out, arg, Timings())
            walls.append(time.perf_counter() - t0)
        snap = devtimer.snapshot()
        if ref is None:
            ref = out.getvalue()
        rec = {"wave_blocks": w, "wall_cold_s": round(walls[0], 2),
               "wall_warm_s": round(walls[1], 2),
               "enc_MBps_warm": round(n / walls[1] / 1e6, 2),
               "device_compute_s": round(snap.get("compute_s", 0), 2),
               "link_s": round(snap.get("link_s", 0), 2),
               "link_MB": round(snap.get("link_bytes", 0) / 1e6, 1),
               "identical_output": out.getvalue() == ref}
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
