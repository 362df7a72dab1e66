"""Ablation timing for the differentiable-forward gap (BASELINE config 5).

The train step's cost structure (1024², spp 4, 4 bounces by default):

  A. megakernel forward         — the non-diff speed of light
  B. bare fused marches         — 4 sequential full-plane march launches
                                  over the batched (spp·H, W) planes, all
                                  lanes active (upper-bounds the march
                                  share of the wavefront path)
  C. wavefront forward, non-diff— trace_rgb(march_impl=fused): XLA shade
                                  chain + per-bounce fused march
  D. diff forward               — C + reparameterized-march gradients
                                  traced (surrogate ∇f evals), no grad
  E. value_and_grad             — D + backward (policy remat: shade
                                  replay, march DCE'd)

C−B ≈ XLA shading cost; D−C ≈ reparam forward cost; E−D ≈ backward cost.
Prints one JSON line.  Knobs: DP_SIZE, DP_SPP, DP_BOUNCES, DP_TAPS.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    size = int(os.environ.get("DP_SIZE", "1024"))
    spp = int(os.environ.get("DP_SPP", "4"))
    bounces = int(os.environ.get("DP_BOUNCES", "4"))
    taps = int(os.environ.get("DP_TAPS", "4"))

    from raymarchrenderer_tpu.core.camera import Camera
    from raymarchrenderer_tpu.core.rng import RNGStream
    from raymarchrenderer_tpu.core.vecmath import Vec3
    from raymarchrenderer_tpu.kernels.march import march_fused, render_fused
    from raymarchrenderer_tpu.render.config import RenderConfig
    from raymarchrenderer_tpu.render.integrator import render_patch_spp
    from raymarchrenderer_tpu.render.raygen import eye_vec, primary_rays
    from raymarchrenderer_tpu.scene.builtin import sphere_on_floor

    interpret = jax.devices()[0].platform != "tpu"
    scene = sphere_on_floor()
    params = scene.init_params()
    cfg = RenderConfig(width=size, height=size, max_bounces=bounces,
                       relax_omega=1.9, normal_taps=taps)
    corners = Camera(aspect=1.0).corner_rays_flat()
    origin = (jnp.int32(0), jnp.int32(0))
    mpix_spp = size * size * spp / 1e6

    # A: megakernel
    a_fn = jax.jit(lambda p: render_fused(scene, p, cfg, corners,
                                          jnp.uint32(0), n_samples=spp,
                                          interpret=interpret))
    t_a, _ = timeit(a_fn, params)

    # B: bare batched marches (bounce-0 planes, all active, x bounces)
    sh = (spp * size, size)
    row = jnp.arange(size, dtype=jnp.int32)[None, :, None]
    col = jnp.arange(size, dtype=jnp.int32)[None, None, :]
    sid = jnp.arange(spp, dtype=jnp.uint32)[:, None, None]
    py = jnp.broadcast_to(row, (spp, size, size)).reshape(sh)
    px = jnp.broadcast_to(col, (spp, size, size)).reshape(sh)
    sample = jnp.broadcast_to(sid, (spp, size, size)).reshape(sh)

    def b_fn(p):
        rng = RNGStream(cfg.seed, px, py, sample, jnp.uint32(1 << 20))
        d = primary_rays(corners, px, py, size, size, rng)
        e = eye_vec(corners)
        o = Vec3(jnp.broadcast_to(e.x, sh), jnp.broadcast_to(e.y, sh),
                 jnp.broadcast_to(e.z, sh))
        ones = jnp.ones(sh, jnp.float32)
        act = jnp.ones(sh, bool)
        acc = jnp.zeros(sh, jnp.float32)
        for _ in range(bounces):
            t, mid, hit = march_fused(scene, p, cfg, o, d, ones, act,
                                      interpret=interpret)
            acc = acc + t
        return acc

    t_b, _ = timeit(jax.jit(b_fn), params)

    # C: wavefront non-diff (fused march + XLA shade)
    def c_fn(p):
        return render_patch_spp(scene, p, cfg, corners, origin,
                                (size, size), jnp.uint32(0), spp,
                                march_impl="fused",
                                interpret=interpret).stack(-1)

    t_c, _ = timeit(jax.jit(c_fn), params)

    # D: diff forward (no grad)
    def d_fn(p):
        c = render_patch_spp(scene, p, cfg, corners, origin,
                             (size, size), jnp.uint32(0), spp,
                             differentiable=True, march_impl="fused",
                             interpret=interpret)
        return jnp.mean(c.stack(-1) ** 2)

    t_d, _ = timeit(jax.jit(d_fn), params)

    # E: full value_and_grad with the march-saving remat policy
    from raymarchrenderer_tpu.diff.march import march_save_policy
    d_remat = jax.checkpoint(d_fn, policy=march_save_policy())
    t_e, _ = timeit(jax.jit(jax.value_and_grad(d_remat)), params)

    rep = {
        "size": size, "spp": spp, "bounces": bounces, "normal_taps": taps,
        "A_megakernel_s": round(t_a, 4),
        "B_bare_marches_s": round(t_b, 4),
        "C_wavefront_fwd_s": round(t_c, 4),
        "D_diff_fwd_s": round(t_d, 4),
        "E_value_and_grad_s": round(t_e, 4),
        "xla_shade_s (C-B)": round(t_c - t_b, 4),
        "reparam_s (D-C)": round(t_d - t_c, 4),
        "backward_s (E-D)": round(t_e - t_d, 4),
        "A_mpix_spp_s": round(mpix_spp / t_a, 2),
        "E_mpix_spp_s": round(mpix_spp / t_e, 2),
    }
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
