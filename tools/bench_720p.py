"""Warm-rate datapoint at the reference's own window size (1280x720,
`Program.cpp:90`) on the fused megakernel — the round-4 verdict's
"non-divisible TPU bench datapoint" (720 is not a multiple of the 32-row
lane tile; the kernel pads and crops).

The CLI path (`render --width 1280 --height 720`) proves the verb runs
fused; its end-to-end wall includes the one-off compile, so the RATE
datapoint is measured here warm.  Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raymarchrenderer_tpu.core.camera import Camera
from raymarchrenderer_tpu.kernels.march import render_fused
from raymarchrenderer_tpu.render.config import RenderConfig
from raymarchrenderer_tpu.scene.builtin import sphere_on_floor


def main():
    spp = int(os.environ.get("BENCH_SPP", "128"))
    scene = sphere_on_floor()
    params = scene.init_params()
    cfg = RenderConfig(width=1280, height=720, relax_omega=2.0,
                       normal_taps=4)
    corners = Camera(aspect=1280 / 720).corner_rays_flat()
    fn = jax.jit(lambda p, c, s: render_fused(scene, p, cfg, c, s,
                                              n_samples=spp))
    jax.block_until_ready(fn(params, corners, jnp.uint32(0)))
    ts = []
    for k in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(params, corners, jnp.uint32(k * spp)))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    rate = 1280 * 720 * spp / dt / 1e6
    print(json.dumps({
        "metric": "Mpix*spp/s @ 1280x720 (impl=pallas-mega, padded "
                  "720->736 rows, platform=%s)"
                  % jax.devices()[0].platform,
        "value": round(rate, 2), "unit": "Mpix*spp/s", "spp": spp,
        "wall_s": round(dt, 4)}))


if __name__ == "__main__":
    main()
