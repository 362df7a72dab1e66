"""One-process TPU session: amortize the axon backend-init stall across
every chip-bound artifact this round needs.

Stages (each prints a tagged line; set TPU_STAGES to a comma list to
restrict):
  bench   — the headline benchmark (bench.py main()).
  parity  — real-TPU fused-vs-oracle parity (VERDICT r1 item 8): the
            fused megakernel + wavefront outputs executed ON THE CHIP
            (Mosaic lowering, not the interpreter) compared against the
            pure-XLA oracle on the same chip; writes
            output/tpu_parity.json.
  ref     — tools/reference_parity.py at full 1280x720 (the 2015-BMP
            comparison artifact, TPU-converged).
  train   — tools/train_bench.py (BASELINE config 5 demo at >=1024^2).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = os.environ.get("TPU_STAGES", "bench,parity,ref,train").split(",")


def log(msg):
    print(f"[tpu_session +{time.perf_counter() - T0:8.1f}s] {msg}",
          flush=True)


def stage_bench():
    import bench
    bench.main()


def stage_parity():
    """Fused-vs-oracle on the real chip (not interpret mode): covers the
    Mosaic lowering the CPU-interpreter bitwise tests cannot."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raymarchrenderer_tpu.core.camera import Camera
    from raymarchrenderer_tpu.kernels.march import render_fused
    from raymarchrenderer_tpu.render.config import RenderConfig
    from raymarchrenderer_tpu.render.integrator import render_sample
    from raymarchrenderer_tpu.scene.builtin import sphere_on_floor

    scene = sphere_on_floor()
    params = scene.init_params()
    cfg = RenderConfig(width=256, height=64, max_steps=96, max_bounces=4,
                       max_dist=100.0)
    corners = Camera(aspect=4.0).corner_rays_flat()
    oracle = np.asarray(render_sample(scene, params, cfg, corners,
                                      jnp.uint32(3)).stack(-1))
    rep = {"platform": jax.devices()[0].platform, "size": [256, 64]}
    # the BITWISE claim is the strict schedule's (lazy_miss is the
    # documented O(rare-lane) trade — the r4 entry below measures it)
    for mode in ("mega", "wavefront"):
        fused = np.asarray(render_fused(scene, params, cfg, corners,
                                        jnp.uint32(3), n_samples=1,
                                        mode=mode, lazy_miss=False,
                                        regen_cadence=16))
        d = np.abs(oracle - fused)
        rep[mode] = {
            "bitwise_equal": bool((d == 0).all()),
            "max_abs_diff": float(d.max()),
            "frac_pixels_differing": float((d.max(-1) > 0).mean()),
        }
        log(f"parity {mode}: bitwise={rep[mode]['bitwise_equal']} "
            f"max={rep[mode]['max_abs_diff']:.3e}")
    # relaxed-march production config (the bench path), strict schedule
    cfgr = cfg.replace(relax_omega=2.0, normal_taps=4)  # round-4 default
    oracle_r = np.asarray(render_sample(scene, params, cfgr, corners,
                                        jnp.uint32(3)).stack(-1))
    fused_r = np.asarray(render_fused(scene, params, cfgr, corners,
                                      jnp.uint32(3), n_samples=1,
                                      mode="mega", lazy_miss=False,
                                      regen_cadence=16))
    dr = np.abs(oracle_r - fused_r)
    rep["mega_relaxed"] = {
        "bitwise_equal": bool((dr == 0).all()),
        "max_abs_diff": float(dr.max()),
        "frac_pixels_differing": float((dr.max(-1) > 0).mean()),
    }
    log(f"parity mega_relaxed: bitwise={rep['mega_relaxed']['bitwise_equal']}")
    # round-4 production schedule (lazy_miss on): measured divergence —
    # rays at the step-budget/max_dist shell only (this 96-step config
    # binds the budget far harder than the 512-step bench default, so
    # this is the knob's worst case on this scene)
    fused_l = np.asarray(render_fused(scene, params, cfgr, corners,
                                      jnp.uint32(3), n_samples=1,
                                      mode="mega"))
    dl = np.abs(oracle_r - fused_l)
    rep["mega_r4_schedule_lazy_miss"] = {
        "bitwise_equal": bool((dl == 0).all()),
        "max_abs_diff": float(dl.max()),
        "frac_pixels_differing": float((dl.max(-1) > 0).mean()),
        "note": "lazy_miss trade class (docs/performance.md): strict "
                "schedule above is the bitwise-parity mode",
    }
    log(f"parity mega_r4_schedule: "
        f"frac={rep['mega_r4_schedule_lazy_miss']['frac_pixels_differing']:.2e}")
    os.makedirs("output", exist_ok=True)
    with open("output/tpu_parity.json", "w") as f:
        json.dump(rep, f, indent=2)
        f.write("\n")
    print(json.dumps(rep))


def stage_ref():
    import runpy
    runpy.run_path(os.path.join(os.path.dirname(__file__),
                                "reference_parity.py"), run_name="__main__")


def stage_train():
    import runpy
    runpy.run_path(os.path.join(os.path.dirname(__file__),
                                "train_bench.py"), run_name="__main__")


T0 = time.perf_counter()

if __name__ == "__main__":
    import jax
    # persistent compile cache: the tunnel's first-RPC stalls are the
    # bottleneck, so never compile the same program twice across sessions
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:
        log(f"compile cache unavailable: {e}")
    log(f"devices: {jax.devices()}")
    for name in STAGES:
        fn = {"bench": stage_bench, "parity": stage_parity,
              "ref": stage_ref, "train": stage_train}.get(name.strip())
        if fn is None:
            continue
        log(f"=== stage {name} ===")
        try:
            fn()
        except Exception as e:
            log(f"stage {name} FAILED: {type(e).__name__}: {e}")
    log("done")
