"""Reproduce every README.md host performance row (VERDICT r2 item 6).

Interleaved best-of-N cold-CLI walls for each preset row (reference
binary vs bin/fqz5 on the same generated corpus, alternating runs so
box-load drift hits both sides equally), plus the like-for-like rANS
kernel rows via /tmp/oracle/harness/kbench (reference) and
tools/host_kernel_bench.py (ours).

Usage:
    python tools/readme_bench.py [--mb 50] [--reps 4]

Prerequisite: tools/oracle/build.sh (builds /tmp/oracle/fqzcomp5 and
harness/kbench).  Emits one JSON line per row and a final markdown
table matching the README layout.
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
ORACLE = "/tmp/oracle/fqzcomp5"
KBENCH = "/tmp/oracle/harness/kbench"
DUEL = "/tmp/oracle/harness/duel"


def gen_corpus(path, target_mb, seed=42):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.gen_corpus(path, target_mb, seed)
    return os.path.getsize(path)


def wall(cmd):
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True, capture_output=True)
    return time.perf_counter() - t0


def interleaved(cmd_a, cmd_b, reps):
    """Back-to-back (a,b) pairs; median walls + median per-pair ratio.

    This box's CPU clock drifts +-30% on minute timescales, so
    per-side best-of-N catches different throttle windows and the
    implied ratio can be off 2x.  Each adjacent pair shares (nearly)
    one clock regime; the median of per-pair ratios is stable."""
    pairs = []
    for _ in range(reps):
        pairs.append((wall(cmd_a), wall(cmd_b)))
    ratios = sorted(b / a for a, b in pairs)
    med_ratio = ratios[len(ratios) // 2]
    med_a = sorted(p[0] for p in pairs)[reps // 2]
    med_b = sorted(p[1] for p in pairs)[reps // 2]
    return med_a, med_b, med_ratio


def preset_row(src, level, reps, decode=False):
    ref_out, our_out = "/tmp/rb_ref.fqz5", "/tmp/rb_our.fqz5"
    ref_cmd = [ORACLE, f"-{level}", "-t", "1", src, ref_out]
    our_cmd = [os.path.join(ROOT, "bin", "fqz5"), f"-{level}",
               "-t", "1", src, our_out]
    ref, ours, ratio = interleaved(ref_cmd, our_cmd, reps)
    row = {"row": f"-{level} encode", "ours_s": round(ours, 2),
           "ref_s": round(ref, 2), "ratio": round(ratio, 2),
           "bytes": os.path.getsize(src), "discipline":
           "cold CLI, -t 1, median of %d interleaved pairs" % reps}
    with open(ref_out, "rb") as a, open(our_out, "rb") as b:
        row["byte_identical"] = a.read() == b.read()
    print(json.dumps(row), flush=True)
    rows = [row]
    if decode:
        ref_cmd = [ORACLE, "-d", "-t", "1", ref_out, "/tmp/rb_ref.out"]
        our_cmd = [os.path.join(ROOT, "bin", "fqz5"), "-d", "-t", "1",
                   our_out, "/tmp/rb_our.out"]
        ref, ours, ratio = interleaved(ref_cmd, our_cmd, reps)
        drow = {"row": f"-{level} decode", "ours_s": round(ours, 2),
                "ref_s": round(ref, 2), "ratio": round(ratio, 2),
                "bytes": os.path.getsize(src), "discipline":
                "cold CLI, -t 1, median of %d interleaved pairs" % reps}
        print(json.dumps(drow), flush=True)
        rows.append(drow)
    return rows


def kernel_row(datafile, order, reps):
    """Kernel rows come from the same-process duel harness
    (tools/oracle/duel.c): reference objects and libfqz5 linked into
    ONE binary, each timed rep paired back-to-back.  Cross-process
    comparisons (kbench vs host_kernel_bench) drift up to 2x with this
    box's CPU clock; the per-pair ratio medians are the stable
    quantity, and the MB/s columns here share one clock regime."""
    d = json.loads(subprocess.run(
        [DUEL, datafile, str(order), str(max(reps * 3, 9))],
        check=True, capture_output=True, text=True).stdout)
    row = {"row": f"rANS order {order:#x}",
           "ours_enc_MBps": d["enc_ours_MBps"],
           "ours_dec_MBps": d["dec_ours_MBps"],
           "ref_enc_MBps": d["enc_ref_MBps"],
           "ref_dec_MBps": d["dec_ref_MBps"],
           "enc_ratio": d["enc_ratio_ours_over_ref_time"],
           "dec_ratio": d["dec_ratio_ours_over_ref_time"],
           "bytes": d["bytes"],
           "comp_parity": d["csz_ours"] == d["csz_ref"]}
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=50)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--levels", default="1,3,5")
    args = ap.parse_args()

    if not os.path.exists(ORACLE) or not os.path.exists(DUEL):
        print("oracle missing; run tools/oracle/build.sh first",
              file=sys.stderr)
        return 2

    src = "/tmp/rb_corpus.fastq"
    n = gen_corpus(src, args.mb)
    print(json.dumps({"corpus_bytes": n}), flush=True)

    rows = []
    for lvl in args.levels.split(","):
        rows += preset_row(src, int(lvl), args.reps, decode=True)

    # kernel rows on real section payloads pulled from the corpus
    with open(src, "rb") as f:
        lines = f.read().split(b"\n")
    with open("/tmp/rb_qual.bin", "wb") as f:
        f.write(b"".join(lines[3::4])[:48_000_000])
    with open("/tmp/rb_seq.bin", "wb") as f:
        f.write(b"".join(lines[1::4])[:48_000_000])
    rows.append(kernel_row("/tmp/rb_qual.bin", 0x0, args.reps))
    rows.append(kernel_row("/tmp/rb_qual.bin", 0x1, args.reps))
    rows.append(kernel_row("/tmp/rb_seq.bin", 0x81, args.reps))

    print("\n| Row | Ours | Reference | Discipline |")
    print("|---|---|---|---|")
    for r in rows:
        if "ours_s" in r:
            print(f"| {r['row']} ({r['bytes'] // 1_000_000}MB) "
                  f"| {r['ours_s']} s | {r['ref_s']} s "
                  f"| {r['discipline']} |")
        else:
            print(f"| {r['row']} ({r['bytes'] // 1_000_000}MB) "
                  f"| {r['ours_enc_MBps']}/{r['ours_dec_MBps']} MB/s "
                  f"| {r['ref_enc_MBps']}/{r['ref_dec_MBps']} MB/s "
                  f"| same-process pairs; time ratios ours/ref "
                  f"{r['enc_ratio']}/{r['dec_ratio']} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
