"""Round-5 on-chip bench session: every workload variant, one JSON.

Run ALONE on the TPU box (timings through the axon tunnel inflate under
host load):  python tools/bench_session_r5.py
Writes output/bench_tpu_r5.json in the round-4 artifact's shape.
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
T0 = time.perf_counter()


def log(msg):
    print(f"[r5 +{time.perf_counter() - T0:8.1f}s] {msg}", flush=True)


def run_json(script, env=None, timeout=900):
    e = dict(os.environ)
    e.update({k: str(v) for k, v in (env or {}).items()})
    e.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT,
                                                           ".jax_cache"))
    t0 = time.perf_counter()
    out = subprocess.run([sys.executable, script], cwd=ROOT, env=e,
                         capture_output=True, text=True, timeout=timeout)
    dt = time.perf_counter() - t0
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        return {"error": (out.stdout + out.stderr)[-400:]}
    d = json.loads(lines[-1])
    d["total_s"] = round(dt, 1)
    return d


def run_cli_render(args, timeout=900, cache_dir=None):
    e = dict(os.environ)
    if cache_dir is not None:
        # pin the CLI's persistent compile cache (utils/cache.py) so the
        # cold/cached pair is honest: a FRESH dir for the cold run, the
        # now-populated one for the cached run
        e["RAYMARCH_CACHE_DIR"] = cache_dir
    out = subprocess.run([sys.executable, "-m", "raymarchrenderer_tpu"]
                         + args, cwd=ROOT, env=e, capture_output=True,
                         text=True, timeout=timeout)
    m = re.search(r"done: (\d+) spp in ([\d.]+)s \(([\d.]+) Mpix\*spp/s\)",
                  out.stdout)
    if not m:
        return {"error": (out.stdout + out.stderr)[-400:]}
    return {"spp": int(m.group(1)), "wall_s": float(m.group(2)),
            "value": float(m.group(3)), "unit": "Mpix*spp/s"}


def main():
    variants = {}

    log("spectral headline")
    variants["spectral-headline"] = run_json("bench.py")
    log("rgb mega")
    variants["rgb-mega"] = run_json("bench.py", {"BENCH_MODE": "rgb"})
    log("nee mega (post shadow-bias fix)")
    variants["nee-mega"] = run_json("bench.py", {"BENCH_MODE": "rgb",
                                                 "BENCH_DIRECT": "1"})
    log("dispersion mega")
    variants["dispersion-mega"] = run_json(
        "bench.py", {"BENCH_MODE": "rgb", "BENCH_DISPERSION": "1"})
    log("env mxu linear")
    variants["env-mxu-linear"] = run_json(
        "bench.py", {"BENCH_MODE": "rgb", "BENCH_ENV": "1"})
    log("env EXACT linear (round-5 quad-footprint single-take)")
    variants["env-exact-linear"] = run_json(
        "bench.py", {"BENCH_MODE": "rgb", "BENCH_ENV": "1",
                     "BENCH_ENV_GATHER": "exact"})
    log("1280x720 (the reference window, fused after the un-gating fix)")
    # the CLI run proves the verb selects the fused path at a
    # non-divisible size; its wall includes the one-off compile, so the
    # RATE is measured warm by tools/bench_720p.py
    cli_args = ["render", "--scene", "sphere_on_floor", "--width", "1280",
                "--height", "720", "--spp", "128", "--chunk", "128",
                "--relax", "2.0", "--normal-taps", "4",
                "--out", "/tmp/r5_720p.png"]
    import shutil
    import tempfile
    cdir = tempfile.mkdtemp(prefix="r5_cli_cache_")
    try:
        variants["render-1280x720-cli"] = run_cli_render(cli_args,
                                                         cache_dir=cdir)
        # second fresh process: the persistent compile cache the CLI
        # wires by default serves every compile from disk (utils/cache.py)
        variants["render-1280x720-cli-cached"] = run_cli_render(
            cli_args, cache_dir=cdir)
    finally:
        shutil.rmtree(cdir, ignore_errors=True)
    variants["render-1280x720-fused-warm"] = run_json("tools/bench_720p.py")
    log("train recorded spp=4")
    variants["train-recorded"] = run_json(
        "tools/train_bench.py", {"TRAIN_SPP": "4"})
    log("train recorded spp=16 + decomposition")
    variants["train-recorded-spp16"] = run_json(
        "tools/train_bench.py", {"TRAIN_SPP": "16", "TRAIN_DECOMP": "1"})
    log("spectral train RECORDED (round 5)")
    variants["train-spectral-recorded"] = run_json(
        "tools/train_bench.py", {"TRAIN_MODE": "spectral",
                                 "TRAIN_IMPL": "recorded",
                                 "TRAIN_SPP": "4"})
    log("spectral train fused per-bounce (the old path, for the ratio)")
    variants["train-spectral-fused"] = run_json(
        "tools/train_bench.py", {"TRAIN_MODE": "spectral",
                                 "TRAIN_IMPL": "fused", "TRAIN_SPP": "4"})

    out = {"round": 5, "variants": variants}
    os.makedirs(os.path.join(ROOT, "output"), exist_ok=True)
    with open(os.path.join(ROOT, "output", "bench_tpu_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    log("written output/bench_tpu_r5.json")
    for k, v in variants.items():
        print(f"  {k:28s} {v.get('value')}")


if __name__ == "__main__":
    main()
