"""Sweep env_mxu_res (the MXU env table area) on the env bench workload:
the composite's remaining cost is the tent weight-gen, linear in table
area — this measures the throughput/fidelity trade the knob controls.

Run alone on the TPU box: python tools/env_res_sweep.py
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raymarchrenderer_tpu.core.camera import Camera
from raymarchrenderer_tpu.kernels.march import render_fused
from raymarchrenderer_tpu.render.config import RenderConfig
from raymarchrenderer_tpu.scene.builtin import SceneBuilder

SIZE, SPP = 1024, 128
v = np.linspace(0.0, 1.0, 512)[:, None, None]
env_img = (np.array([0.3, 0.5, 1.0]) * (1 - v)
           + np.array([1.0, 0.6, 0.2]) * v)
env_img = np.broadcast_to(env_img, (512, 1024, 3)).astype(np.float32)

b = SceneBuilder()
m_floor = b.diffuse([0.8, 0.8, 0.8])
m_ball = b.diffuse([0.2, 0.8, 0.3])
b.box(m_floor, [0, -0.025, 0], [32, 0.05, 32])
b.sphere(m_ball, [0, 1, 0], 1.0)
base = b.build(env_image=env_img, env_gather="mxu")
params = base.init_params()
cfg = RenderConfig(width=SIZE, height=SIZE, relax_omega=1.9, normal_taps=4)
corners = Camera(aspect=1.0).corner_rays_flat()

exact = dataclasses.replace(base, env_gather="exact")
ref = None
for res in ((64, 128), (32, 64), (16, 32), (8, 16)):
    scene = dataclasses.replace(base, env_mxu_res=res)
    fn = jax.jit(lambda p, c, s, sc=scene: render_fused(
        sc, p, cfg, c, s, n_samples=SPP))
    out = fn(params, corners, jnp.uint32(0))
    jax.block_until_ready(out)
    times = []
    for s in (1, 2):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(params, corners, jnp.uint32(s * SPP)))
        times.append(time.perf_counter() - t0)
    rate = SIZE * SIZE * SPP / min(times) / 1e6
    if ref is None:
        # fidelity vs the exact GL_LINEAR render, once (small spp for time)
        fe = jax.jit(lambda p, c, s: render_fused(
            exact, p, cfg, c, s, n_samples=8))
        ref = np.asarray(fe(params, corners, jnp.uint32(0)))
    fm = jax.jit(lambda p, c, s, sc=scene: render_fused(
        sc, p, cfg, c, s, n_samples=8))
    img = np.asarray(fm(params, corners, jnp.uint32(0)))
    err = float(np.abs(img - ref).mean())
    print(json.dumps({"res": list(res), "mpix_spp_s": round(rate, 1),
                      "mean_abs_err_vs_exact_8spp": round(err, 5)}),
          flush=True)
