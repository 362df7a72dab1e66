"""One-process TPU run of the bench VARIANTS the round-2 'Done' criteria
ask for: env-map (deferred-sky wavefront, K-banked misses), dispersion
(separateChannels megakernel), plain RGB mega, and the no-remat train
step.  Each stage sets the env knobs and calls the real drivers, so the
printed JSON lines are exactly what `bench.py`/`train_bench.py` emit.
"""
from __future__ import annotations

import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.perf_counter()


def log(msg):
    print(f"[variants +{time.perf_counter() - T0:8.1f}s] {msg}", flush=True)


def run_bench(**env):
    os.environ.update({k: str(v) for k, v in env.items()})
    import bench
    importlib.reload(bench)
    bench.main()
    for k in env:
        os.environ.pop(k, None)


if __name__ == "__main__":
    import jax
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    log(f"devices: {jax.devices()}")

    log("=== rgb mega (refresh) ===")
    run_bench(BENCH_MODE="rgb", BENCH_PROFILE="0")
    log("=== dispersion mega ===")
    run_bench(BENCH_MODE="rgb", BENCH_DISPERSION="1", BENCH_PROFILE="0")
    log("=== NEE mega (shadow marches as in-loop segments) ===")
    run_bench(BENCH_MODE="rgb", BENCH_DIRECT="1", BENCH_PROFILE="0")
    log("=== env wavefront (K-banked deferred sky) ===")
    run_bench(BENCH_MODE="rgb", BENCH_ENV="1", BENCH_PROFILE="0")
    log("=== train, no remat ===")
    os.environ["TRAIN_REMAT"] = "0"
    os.environ["TRAIN_SIZE"] = "1024"
    import runpy
    runpy.run_path(os.path.join(os.path.dirname(__file__),
                                "train_bench.py"), run_name="__main__")
    log("done")
