"""Re-sweep the scheduling knobs UNDER the round-4 schedule (lazy miss +
cadence 16): the round-3 optima (omega 1.9, tile (32,128), 4-tap
normals) were measured under the strict schedule; cheaper march steps
can move them.

Run alone on the TPU box (timings through the axon tunnel inflate under
host load): python tools/knob_sweep_r4.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raymarchrenderer_tpu.core.camera import Camera
from raymarchrenderer_tpu.kernels.march import render_fused_spectral
from raymarchrenderer_tpu.render.config import RenderConfig
from raymarchrenderer_tpu.render.spectral_integrator import spectral_demo

SIZE, SPP = 1024, 128
scene, params, mats = spectral_demo()
corners = Camera(aspect=1.0).corner_rays_flat()

VARIANTS = [
    ("baseline o1.9 b(32,128) t4", dict()),
    ("omega 1.8", dict(relax_omega=1.8)),
    ("omega 2.0", dict(relax_omega=2.0)),
    ("omega 2.1", dict(relax_omega=2.1)),
    ("block (16,128)", dict(block=(16, 128))),
    ("block (64,128)", dict(block=(64, 128))),
    ("block (32,256)", dict(block=(32, 256))),
    ("normal_taps 0 (vjp)", dict(normal_taps=0)),
]

for name, kw in VARIANTS:
    cfg = RenderConfig(width=SIZE, height=SIZE,
                       relax_omega=kw.pop("relax_omega", 1.9),
                       normal_taps=kw.pop("normal_taps", 4))
    try:
        fn = jax.jit(lambda p, c, s, kw=dict(kw): render_fused_spectral(
            scene, p, mats, cfg, c, s, n_samples=SPP, **kw))
        jax.block_until_ready(fn(params, corners, jnp.uint32(0)))
        times = []
        for s in (1, 2):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(params, corners, jnp.uint32(s * SPP)))
            times.append(time.perf_counter() - t0)
        rate = SIZE * SIZE * SPP / min(times) / 1e6
        print(json.dumps({"variant": name,
                          "mpix_spp_s": round(rate, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": name, "error": str(e)[:160]}),
              flush=True)
