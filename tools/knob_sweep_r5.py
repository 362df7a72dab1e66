"""Round-5 headline knob re-sweep AFTER the issue-count op cuts (RNG
stage caching, single band apply, (1-omega) const fold, scalar gstep).

The Mosaic issue-count artifact (output/mosaic_issue_count.json) shows the
kernel at ~96% of the VPU issue roofline at the current schedule; this
sweep verifies the schedule knobs are still at their local optimum under
the slightly cheaper op mix.

Run ALONE on the TPU box: python tools/knob_sweep_r5.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raymarchrenderer_tpu.core.camera import Camera
from raymarchrenderer_tpu.kernels.march import render_fused_spectral
from raymarchrenderer_tpu.render.config import RenderConfig
from raymarchrenderer_tpu.render.spectral_integrator import spectral_demo

SIZE = int(os.environ.get("SWEEP_SIZE", "1024"))
SPP = int(os.environ.get("SWEEP_SPP", "128"))

scene, params, mats = spectral_demo()
corners = Camera(aspect=1.0).corner_rays_flat()

# (name, omega, unroll, cadence, block)
VARIANTS = [
    ("baseline o2.0 u32 c16 b(32,128)", 2.0, 32, 16, (32, 128)),
    ("c8", 2.0, 32, 8, (32, 128)),
    ("c32 (no mid-pass)", 2.0, 32, 0, (32, 128)),
    ("u48 c16", 2.0, 48, 16, (32, 128)),
    ("u48 c24", 2.0, 48, 24, (32, 128)),
    ("o2.1", 2.1, 32, 16, (32, 128)),
    ("o1.9", 1.9, 32, 16, (32, 128)),
    ("b(32,256)", 2.0, 32, 16, (32, 256)),
]

results = []
for name, omega, unroll, cad, block in VARIANTS:
    cfg = RenderConfig(width=SIZE, height=SIZE, relax_omega=omega,
                       normal_taps=4)
    fn = jax.jit(lambda p, c, s, cf=cfg, u=unroll, cd=cad, bl=block:
                 render_fused_spectral(scene, p, mats, cf, c, s,
                                       n_samples=SPP, march_unroll=u,
                                       lazy_miss=True, regen_cadence=cd,
                                       block=bl))
    try:
        img = fn(params, corners, jnp.uint32(0))
        jax.block_until_ready(img)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(params, corners, jnp.uint32(0)))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        rate = SIZE * SIZE * SPP / dt / 1e6
        results.append({"name": name, "mpix_spp_per_s": round(rate, 1),
                        "wall_s": round(dt, 4)})
        print(f"{name:34s} {rate:8.1f} Mpix*spp/s", flush=True)
    except Exception as e:
        results.append({"name": name, "error": f"{type(e).__name__}: {e}"})
        print(f"{name:34s} ERROR {type(e).__name__}: {e}", flush=True)

os.makedirs("output", exist_ok=True)
with open("output/knob_sweep_r5.json", "w") as f:
    json.dump(results, f, indent=1)
print(json.dumps(results))
