"""Regenerate the committed golden renders (`output/`) and regression
arrays (`tests/goldens/`).

The reference's only regression artifacts are 24 converged BMPs in
`output/` (SURVEY.md §4) — eyeball baselines.  We commit two tiers:

  * display goldens: `output/golden_<scene>.png`, 256x256 @ 64 spp — the
    human/judge-facing converged renders (fast on TPU, OK on CPU),
  * regression goldens: `tests/goldens/<scene>.npy`, 64x64 @ 4 spp oracle
    renders on CPU — exact arrays asserted bitwise by
    `tests/test_golden.py` (the RNG is counter-based, so any drift is a
    real semantics change).

Run from the repo root: `python tools/make_goldens.py [--display-only]`.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENES = [
    ("sphere_on_floor", None), ("single_sphere", None), ("csg", None),
    ("cornell", None), ("glass", None), ("volume", None),
    ("default", "data/scenes/default.scene"),
    ("simple", "data/scenes/simple.scene"),
    ("glass_test", "data/scenes/glass_test.scene"),
    ("material_test", "data/scenes/material_test.scene"),
    ("multilight", "data/scenes/multilight.scene"),
    ("object_test", "data/scenes/object_test.scene"),
]

# per-scene camera overrides: (eye, look_at) — scenes whose geometry
# occludes the default camera (the cornell box encloses the origin)
CAMERAS = {
    "cornell": ((0.0, 2.0, 7.0), (0.0, 2.0, 0.0)),
}

REG_CFG = dict(width=64, height=64, max_steps=96, max_bounces=3,
               max_dist=100.0)
REG_SPP = 4
DISPLAY_CFG = dict(width=256, height=256, max_steps=256, max_bounces=8,
                   max_dist=1000.0)
DISPLAY_SPP = 64


def build(name, path):
    from raymarchrenderer_tpu.scene import builtin, load_scene
    if path:
        return load_scene(path)
    return getattr(builtin, name if hasattr(builtin, name)
                   else {"csg": "csg_demo", "glass": "glass_demo",
                         "volume": "volume_demo"}[name])()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--display-only", action="store_true")
    ap.add_argument("--regression-only", action="store_true")
    args = ap.parse_args()

    import jax
    if args.regression_only:
        # regression goldens are defined as CPU artifacts (the test suite
        # runs on the forced-CPU backend; bitwise equality is the contract)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from raymarchrenderer_tpu.core.camera import Camera
    from raymarchrenderer_tpu.io import save_image
    from raymarchrenderer_tpu.render.config import RenderConfig
    from raymarchrenderer_tpu.render.integrator import render

    on_tpu = jax.devices()[0].platform == "tpu"
    os.makedirs("output", exist_ok=True)
    os.makedirs("tests/goldens", exist_ok=True)

    for name, path in SCENES:
        scene = build(name, path)
        params = scene.init_params()

        cam = Camera(aspect=1.0)
        if name in CAMERAS:
            cam.eye = CAMERAS[name][0]
            cam.look_at(CAMERAS[name][1])
        corners = cam.corner_rays_flat()

        if not args.display_only:
            cfg = RenderConfig(**REG_CFG)
            img, _ = render(scene, params, cfg, corners, spp=REG_SPP)
            np.save(f"tests/goldens/{name}.npy",
                    np.asarray(img, np.float32))
            print(f"regression golden {name}: mean={float(img.mean()):.5f}")

        if not args.regression_only:
            cfg = RenderConfig(**DISPLAY_CFG)
            if on_tpu and not scene.has_env_map:
                from raymarchrenderer_tpu.kernels.march import (
                    render_progressive_fused)
                img, _ = render_progressive_fused(
                    scene, params, cfg, corners, spp=DISPLAY_SPP,
                    samples_per_launch=16)
            else:
                img, _ = render(scene, params, cfg, corners,
                                spp=DISPLAY_SPP)
            save_image(f"output/golden_{name}.png", np.asarray(img))
            print(f"display golden {name}: mean={float(jnp.mean(img)):.5f}")


if __name__ == "__main__":
    main()
