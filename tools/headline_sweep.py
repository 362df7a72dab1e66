"""Round-4 headline sweep: lazy_miss x regen_cadence x march_unroll on the
spectral megakernel at the bench workload (1024^2 x 128 spp, one chip).

Also asserts output equality vs the round-3 baseline config per variant
(regen_cadence is bitwise by construction; lazy_miss is expected bitwise
on this scene — geometry well inside max_dist — and the check verifies).
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
cfg = RenderConfig(width=SIZE, height=SIZE, relax_omega=1.9, normal_taps=4)
corners = Camera(aspect=1.0).corner_rays_flat()

import ast
env_v = os.environ.get("SWEEP_VARIANTS")
if env_v:
    variants = [tuple(v) for v in ast.literal_eval(env_v)]
else:
    variants = []
    for unroll in (32, 16):
        for lazy in (False, True):
            for cad in (0, 16, 8, 4):
                if cad and cad >= unroll:
                    continue
                variants.append((unroll, lazy, cad))

base_img = None
results = []
for unroll, lazy, cad in variants:
    name = f"unroll{unroll}_lazy{int(lazy)}_cad{cad}"
    try:
        fn = jax.jit(lambda p, c, s, u=unroll, lz=lazy, cd=cad:
                     render_fused_spectral(scene, p, mats, cfg, c, s,
                                           n_samples=SPP, march_unroll=u,
                                           lazy_miss=lz, regen_cadence=cd))
        out = fn(params, corners, jnp.uint32(0))
        jax.block_until_ready(out)
        times = []
        for s in (1, 2):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(params, corners, jnp.uint32(s * SPP)))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        rate = SIZE * SIZE * SPP / dt / 1e6
        if base_img is None:
            base_img = np.asarray(out)
            eq = "baseline"
        else:
            diff = np.abs(np.asarray(out) - base_img)
            eq = ("bitwise" if diff.max() == 0.0
                  else f"max{diff.max():.2e}_frac{(diff > 1e-4).mean():.1e}")
        row = {"variant": name, "mpix_spp_s": round(rate, 1), "eq": eq}
    except Exception as e:  # noqa: BLE001
        row = {"variant": name, "error": str(e)[:160]}
    results.append(row)
    print(json.dumps(row), flush=True)

print(json.dumps(sorted((r for r in results if "mpix_spp_s" in r),
                        key=lambda r: -r["mpix_spp_s"])[:5]))
