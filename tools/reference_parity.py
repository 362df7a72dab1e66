"""Converged-image parity against the reference's own 2015 golden renders.

The 24 BMPs in `/root/reference/RayMarch Renderer/output/` (written by
`Graphics::SaveImage`, `Graphics.cpp:754-799`) are the only external
ground truth the reference ever produced.  Most depict `default.scene`
at the window size 1280x720 (`Program.cpp:90`).

This script renders the reference's OWN `default.scene` file (both scene
format generations parse natively; constants untweaked) with the same
resolution and sRGB encode, and reports:

  * red-sphere (matID 2 at (-1,0,0)) and green-glass-panel (matID 4 at
    (-4,1,0)) centroid alignment in pixels -- a pure CAMERA/PROJECTION
    check: if the pinhole model, handedness, FOV and aspect handling all
    match, the silhouettes land on the same pixels.  This is the artifact
    backing the camera decisions documented in `core/camera.py`.
  * global luminance statistics (Pearson r, mean levels) and a global
    SSIM on the luma channel.

Camera pose: the 2015 goldens were NOT rendered from reference HEAD's
`Program.cpp:102` pose (eye=(0,4,-6), dir=norm(0,-3,6)): from that pose
the red sphere projects ~30% of the half-height BELOW the vertical
center, while every 2015 BMP has it dead-center vertically.  The pose
the goldens fix is eye=(0,4,-6) LOOKING AT THE ORIGIN (dir=norm(0,-4,6))
-- with it the red sphere's predicted projection lands on the BMP
centroid to ~1px in x and y simultaneously, and the green panel agrees
independently.  One scalar (the 2015 look direction) is estimated from
the target; the horizontal placement, object scale, aspect mapping and
the second object's position are then independent checks.

Known content deltas documented once (the committed BMPs predate HEAD's
scene constants; pixel-perfect equality is impossible for anyone,
including the reference itself):
  * the right-hand sphere (matID 3, `shader_volumeScatter` gray 0.5 at
    HEAD) renders BLUE in every 2015 image;
  * emitter power / sky levels evidently differ (2015 floor is darker).
Structure (geometry, camera, floor shading, light transport) is what
parity can and does mean here.

Writes output/reference_parity.png (side-by-side) and prints one JSON
line.  Knobs: PARITY_SPP (default 2048 on TPU / 64 elsewhere),
PARITY_REF (default 2015-07-12_23-07), PARITY_SCALE (default 1 —
integer downscale factor; the reference BMP is block-averaged and we
render at the reduced size, for CPU-budget runs).
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DIR = "/root/reference/RayMarch Renderer/output"
REF_SCENE = "/root/reference/RayMarch Renderer/data/scenes/default.scene"

# the pose fixed by the 2015 goldens (see module docstring)
GOLDEN_EYE = (0.0, 4.0, -6.0)
GOLDEN_DIR = (0.0, -4.0, 6.0)


def luma(u8):
    f = u8.astype(np.float32) / 255.0
    return 0.2126 * f[..., 0] + 0.7152 * f[..., 1] + 0.0722 * f[..., 2]


def ssim(a, b):
    """Global SSIM on float [0,1] images (single window -- the standard
    constants C1/C2, no sliding window: converged-vs-converged comparison
    wants a scalar, and Monte-Carlo residue defeats 8x8 windows anyway)."""
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ma, mb = a.mean(), b.mean()
    va, vb = a.var(), b.var()
    cov = ((a - ma) * (b - mb)).mean()
    return float(((2 * ma * mb + c1) * (2 * cov + c2))
                 / ((ma ** 2 + mb ** 2 + c1) * (va + vb + c2)))


def channel_centroid(u8, chan):
    """Centroid of pixels strongly dominated by one channel.  chan 0 finds
    the matID-2 red sphere, chan 1 the matID-4 green glass panel."""
    f = u8.astype(np.float32)
    o1, o2 = [c for c in range(3) if c != chan]
    mask = (f[..., chan] > 96) & (f[..., chan] > 1.6 * f[..., o1]) \
        & (f[..., chan] > 1.6 * f[..., o2])
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return None
    return float(xs.mean()), float(ys.mean())


def dist(a, b):
    if a is None or b is None:
        return None
    return float(np.hypot(a[0] - b[0], a[1] - b[1]))


def main():
    import jax
    import jax.numpy as jnp

    from raymarchrenderer_tpu.core.camera import Camera
    from raymarchrenderer_tpu.io.image import load_bmp, save_png, to_srgb_u8
    from raymarchrenderer_tpu.render.config import RenderConfig
    from raymarchrenderer_tpu.scene.graph import load_scene

    platform = jax.devices()[0].platform
    spp = int(os.environ.get("PARITY_SPP",
                             "2048" if platform == "tpu" else "64"))
    ref_name = os.environ.get("PARITY_REF", "2015-07-12_23-07")
    ref = load_bmp(os.path.join(REF_DIR, ref_name + ".bmp"))
    f = int(os.environ.get("PARITY_SCALE", "1"))
    if f > 1:
        H, W = ref.shape[:2]
        h, w = H // f, W // f
        ref = ref[:h * f, :w * f].reshape(h, f, w, f, 3) \
            .mean(axis=(1, 3)).astype(np.uint8)
    h, w = ref.shape[:2]

    scene = load_scene(REF_SCENE)
    params = scene.init_params()
    cfg = RenderConfig(width=w, height=h, max_bounces=16, max_steps=512,
                       relax_omega=1.9, normal_taps=4)
    corners = Camera(eye=GOLDEN_EYE, direction=GOLDEN_DIR,
                     aspect=w / h).corner_rays_flat()

    if platform == "tpu":
        from raymarchrenderer_tpu.kernels.march import render_fused
        # 720 rows tile by 16; chunk the spp so one launch stays ~seconds
        chunk, n, img = 64, 0, jnp.zeros((h, w, 3), jnp.float32)
        while n < spp:
            k = min(chunk, spp - n)
            c = render_fused(scene, params, cfg, corners, jnp.uint32(n),
                             n_samples=k, block=(16, 128))
            img = (img * n + c * k) / (n + k)
            n += k
    else:
        from raymarchrenderer_tpu.render.integrator import render
        img, n = render(scene, params, cfg, corners, spp=spp)
    ours = to_srgb_u8(np.asarray(img))

    la, lb = luma(ref), luma(ours)
    r = float(np.corrcoef(la.ravel(), lb.ravel())[0, 1])
    s = ssim(la, lb)
    red_ref = channel_centroid(ref, 0)
    red_our = channel_centroid(ours, 0)
    green_ref = channel_centroid(ref, 1)
    green_our = channel_centroid(ours, 1)

    side = np.concatenate([ref, ours], axis=1)
    os.makedirs("output", exist_ok=True)
    # already sRGB u8 -- writing through save_png's OETF would double
    # encode; decode to linear first so it round-trips
    from raymarchrenderer_tpu.io.image import _srgb_to_linear_np
    save_png("output/reference_parity.png",
             _srgb_to_linear_np(side.astype(np.float32) / 255.0))

    print(json.dumps({
        "ref": ref_name, "size": [w, h], "spp": int(n), "platform": platform,
        "luma_pearson_r": round(r, 4),
        "ssim_luma": round(s, 4),
        "red_sphere_centroid_ref": red_ref,
        "red_sphere_centroid_ours": red_our,
        "red_centroid_dist_px": (None if dist(red_ref, red_our) is None
                                 else round(dist(red_ref, red_our), 2)),
        "green_panel_centroid_ref": green_ref,
        "green_panel_centroid_ours": green_our,
        "green_centroid_dist_px": (None if dist(green_ref, green_our) is None
                                   else round(dist(green_ref, green_our), 2)),
        "mean_luma_ref": round(float(la.mean()), 4),
        "mean_luma_ours": round(float(lb.mean()), 4),
    }))


if __name__ == "__main__":
    main()
