"""Collect the round's bench lines into ONE committed artifact
(output/bench_tpu_r{N}.json): every workload variant through the real
`bench.py`, plus the train step through `tools/train_bench.py`.

Run on the TPU box:  python tools/bench_artifact.py 4
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = [
    ("spectral-headline", {}),
    ("rgb-mega", {"BENCH_MODE": "rgb"}),
    ("nee-mega", {"BENCH_MODE": "rgb", "BENCH_DIRECT": "1"}),
    ("dispersion-mega", {"BENCH_MODE": "rgb", "BENCH_DISPERSION": "1"}),
    ("env-mxu-linear", {"BENCH_MODE": "rgb", "BENCH_ENV": "1"}),
    ("env-mxu-nearest", {"BENCH_MODE": "rgb", "BENCH_ENV": "1",
                         "BENCH_ENV_FILTER": "nearest"}),
    ("env-exact-linear", {"BENCH_MODE": "rgb", "BENCH_ENV": "1",
                          "BENCH_ENV_GATHER": "exact"}),
    ("strict-schedule-headline", {"BENCH_LAZY_MISS": "0",
                                  "BENCH_REGEN_CADENCE": "0"}),
]


def main():
    rnd = sys.argv[1] if len(sys.argv) > 1 else "4"
    out = {"round": int(rnd), "variants": {}}
    for name, env in VARIANTS:
        e = dict(os.environ, BENCH_PROFILE="0", **env)
        t0 = time.perf_counter()
        r = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                           capture_output=True, text=True, env=e, cwd=ROOT,
                           timeout=900)
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("{")]
        row = (json.loads(line[-1]) if line
               else {"error": (r.stderr or r.stdout)[-300:]})
        row["total_s"] = round(time.perf_counter() - t0, 1)
        out["variants"][name] = row
        print(name, row.get("value", row.get("error")), flush=True)

    t0 = time.perf_counter()
    r = subprocess.run([sys.executable,
                        os.path.join(ROOT, "tools", "train_bench.py")],
                       capture_output=True, text=True, cwd=ROOT,
                       env=dict(os.environ), timeout=1800)
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    row = (json.loads(line[-1]) if line
           else {"error": (r.stderr or r.stdout)[-300:]})
    row["total_s"] = round(time.perf_counter() - t0, 1)
    out["variants"]["train-recorded"] = row
    print("train-recorded", row.get("value", row.get("error")), flush=True)

    path = os.path.join(ROOT, "output", f"bench_tpu_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
