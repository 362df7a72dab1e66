"""Differentiable rendering tests (BASELINE config 4).

The north-star acceptance check: gradients of the march / pixel loss w.r.t.
scene parameters match central finite differences (SURVEY.md §4 item 4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raymarchrenderer_tpu.core.camera import Camera
from raymarchrenderer_tpu.core.vecmath import Vec3
from raymarchrenderer_tpu.diff.march import march_diff
from raymarchrenderer_tpu.render.config import RenderConfig
from raymarchrenderer_tpu.render.integrator import render_sample
from raymarchrenderer_tpu.scene.builtin import single_sphere, sphere_on_floor

CFG = RenderConfig(width=8, height=8, spp=1, max_steps=256,
                   max_bounces=2, max_dist=100.0)


def _t_of_radius(scene):
    """March a single head-on ray at the unit sphere at (0,1,0); the hit
    distance as a function of the radius parameter."""
    base = scene.init_params()

    def t_of(r):
        params = jax.tree.map(lambda x: x, base)
        # objects[0] params = [centre(3,), radius(3,)] for map_sphere
        params["objects"][0][1] = jnp.full((3,), r, jnp.float32)
        o = Vec3.full((1, 1), 0.0, 1.0, -5.0)
        d = Vec3.full((1, 1), 0.0, 0.0, 1.0)
        ones = jnp.ones((1, 1), jnp.float32)
        active = jnp.ones((1, 1), bool)
        t, _, _ = march_diff(scene, CFG, params, o, d, ones, active)
        return t[0, 0]

    return t_of


class TestMarchAdjoint:
    def test_dt_dradius_is_minus_one(self):
        """Head-on ray: t = 5 - r exactly, so dt/dr = -1 (implicit fn)."""
        scene = single_sphere()
        t_of = _t_of_radius(scene)
        t = t_of(1.0)
        assert abs(float(t) - 4.0) < 0.05  # sphere-trace converges to eps
        g = jax.grad(t_of)(1.0)
        assert abs(float(g) + 1.0) < 1e-3

    def test_dt_vs_finite_difference(self):
        scene = single_sphere()
        t_of = _t_of_radius(scene)
        g = float(jax.grad(t_of)(0.8))
        eps = 1e-3
        fd = (float(t_of(0.8 + eps)) - float(t_of(0.8 - eps))) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=1e-2, atol=1e-3)

    def test_relaxed_march_gradients(self):
        """The relaxed march composes with the implicit adjoint: the VJP
        only needs the (detached) hit point, not the step schedule."""
        scene = single_sphere()
        base = scene.init_params()
        cfg = CFG.replace(relax_omega=1.9)

        def t_of(r):
            params = jax.tree.map(lambda x: x, base)
            params["objects"][0][1] = jnp.full((3,), r, jnp.float32)
            o = Vec3.full((1, 1), 0.0, 1.0, -5.0)
            d = Vec3.full((1, 1), 0.0, 0.0, 1.0)
            ones = jnp.ones((1, 1), jnp.float32)
            active = jnp.ones((1, 1), bool)
            t, _, _ = march_diff(scene, cfg, params, o, d, ones, active)
            return t[0, 0]

        assert abs(float(t_of(1.0)) - 4.0) < 0.05
        g = jax.grad(t_of)(1.0)
        assert abs(float(g) + 1.0) < 1e-3

    def test_miss_rays_zero_gradient(self):
        scene = single_sphere()
        base = scene.init_params()

        def t_of(r):
            params = jax.tree.map(lambda x: x, base)
            params["objects"][0][1] = jnp.full((3,), r, jnp.float32)
            o = Vec3.full((1, 1), 0.0, 10.0, -5.0)   # passes far above
            d = Vec3.full((1, 1), 0.0, 0.0, 1.0)
            ones = jnp.ones((1, 1), jnp.float32)
            t, _, _ = march_diff(scene, CFG, params, o, d, ones,
                                 jnp.ones((1, 1), bool))
            return t[0, 0]

        assert float(jax.grad(t_of)(1.0)) == 0.0

    def test_gradient_to_ray_origin(self):
        """dt/doz = -1 for a head-on +z ray (moving the origin closer)."""
        scene = single_sphere()
        params = scene.init_params()

        def t_of(oz):
            o = Vec3(jnp.zeros((1, 1)), jnp.ones((1, 1)),
                     jnp.full((1, 1), oz))
            d = Vec3.full((1, 1), 0.0, 0.0, 1.0)
            ones = jnp.ones((1, 1), jnp.float32)
            t, _, _ = march_diff(scene, CFG, params, o, d, ones,
                                 jnp.ones((1, 1), bool))
            return t[0, 0]

        g = float(jax.grad(t_of)(-5.0))
        np.testing.assert_allclose(g, -1.0, rtol=1e-3)


class TestPixelGradients:
    @pytest.fixture(scope="class")
    def setup(self):
        scene = sphere_on_floor()
        cfg = RenderConfig(width=24, height=24, spp=1, max_steps=128,
                           max_bounces=2, max_dist=100.0)
        corners = Camera(aspect=1.0).corner_rays_flat()
        return scene, cfg, corners

    def test_albedo_gradient_vs_fd(self, setup):
        """d mean(image) / d ball-albedo-green: continuous parameter, so FD
        on the same RNG stream matches closely."""
        scene, cfg, corners = setup
        base = scene.init_params()

        def loss(g):
            params = jax.tree.map(lambda x: x, base)
            albedo = params["materials"][2][0]
            params["materials"][2][0] = albedo.at[1].set(g)
            img = render_sample(scene, params, cfg, corners, jnp.uint32(0),
                                differentiable=True)
            return jnp.mean(img.stack(-1))

        loss_j = jax.jit(loss)
        grad_j = jax.jit(jax.grad(loss))
        g = float(grad_j(0.8))
        eps = 1e-2
        fd = (float(loss_j(0.8 + eps)) - float(loss_j(0.8 - eps))) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=5e-2, atol=1e-5)
        assert g > 0.0  # brighter ball → brighter image

    def test_geometry_gradient_flows(self):
        """Gradient w.r.t. the ball radius is finite and nonzero through the
        reparameterized march.

        Note: with only diffuse albedos and emitters, radiance is piecewise
        CONSTANT in geometry (albedo products don't depend on the hit
        point), so the continuous gradient is legitimately zero — geometry
        gradients appear through next-event estimation, whose cos/1-r²
        terms vary smoothly with the hit point.  Hence direct_light=True."""
        from raymarchrenderer_tpu.scene.builtin import SceneBuilder
        b = SceneBuilder()
        m_floor = b.diffuse([0.8, 0.8, 0.8])
        m_ball = b.diffuse([0.5, 0.5, 0.5])
        b.box(m_floor, [0, -0.025, 0], [32, 0.05, 32])
        b.sphere(m_ball, [0, 1, 0], 1.0)
        # x=-4: the corrected camera handedness (screen-right = +x, fixed by
        # the reference goldens — core/camera.py) mirrors the frame relative
        # to the pre-fix camera; mirroring the light keeps the rendered
        # image (and this test's FD configuration) bit-identical.
        b.light([-4, 6, -3], 40.0, 0.5)
        b.sky(0.1)
        scene = b.build()
        base = scene.init_params()
        cfg = RenderConfig(width=24, height=24, spp=1, max_steps=128,
                           max_bounces=2, max_dist=100.0)
        corners = Camera(aspect=1.0).corner_rays_flat()

        def loss(r):
            params = jax.tree.map(lambda x: x, base)
            params["objects"][1][1] = jnp.full((3,), r, jnp.float32)
            img = render_sample(scene, params, cfg, corners, jnp.uint32(0),
                                direct_light=True, differentiable=True)
            return jnp.mean(img.stack(-1))

        loss_j = jax.jit(loss)
        g = float(jax.jit(jax.grad(loss))(1.0))
        assert np.isfinite(g)
        assert g != 0.0
        # FD check on the same RNG stream (loose: FD crosses silhouette
        # discontinuities the reparameterized estimator doesn't model)
        eps = 1e-3
        fd = (float(loss_j(1.0 + eps)) - float(loss_j(1.0 - eps))) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=0.35, atol=2e-3)


class TestFusedDifferentiable:
    """The production differentiable path: Pallas forward march
    (`kernels.march.march_fused`) + the shared implicit adjoint
    (`diff.march.march_diff_fused`).  Everything here runs the Pallas
    interpreter (the CPU "fake backend")."""

    @pytest.fixture(scope="class")
    def setup(self):
        from raymarchrenderer_tpu.render.integrator import render_patch
        scene = sphere_on_floor()
        cfg = RenderConfig(width=64, height=32, spp=1, max_steps=96,
                           max_bounces=3, max_dist=100.0)
        corners = Camera(aspect=2.0).corner_rays_flat()
        return scene, cfg, corners, render_patch

    def test_march_fused_bitwise_parity(self, setup):
        """The Pallas march IS the oracle march traced over tiles."""
        from raymarchrenderer_tpu.core.rng import RNGStream
        from raymarchrenderer_tpu.kernels.march import march_fused
        from raymarchrenderer_tpu.render.integrator import march
        from raymarchrenderer_tpu.render.raygen import (
            eye_vec, pixel_grid, primary_rays)
        scene, cfg, corners, _ = setup
        params = scene.init_params()
        px, py = pixel_grid(cfg.width, cfg.height)
        rng = RNGStream(cfg.seed, px, py, jnp.uint32(0), jnp.uint32(1 << 20))
        d = primary_rays(corners, px, py, cfg.width, cfg.height, rng)
        e = eye_vec(corners)
        shape = (cfg.height, cfg.width)
        eye = Vec3(jnp.broadcast_to(e.x, shape),
                   jnp.broadcast_to(e.y, shape),
                   jnp.broadcast_to(e.z, shape))
        ones = jnp.ones(shape, jnp.float32)
        act = jnp.ones(shape, bool)
        t0, m0, h0 = march(scene, params, cfg, eye, d, ones, act)
        t1, m1, h1 = march_fused(scene, params, cfg, eye, d, ones, act,
                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))

    def test_fused_gradients_bitwise_equal_oracle(self, setup):
        """Same forward t (bitwise) + shared adjoint ⇒ bitwise-equal grads
        for the full differentiable render."""
        scene, cfg, corners, render_patch = setup
        base = scene.init_params()
        origin = (jnp.int32(0), jnp.int32(0))

        def loss(params, impl):
            c = render_patch(scene, params, cfg, corners, origin,
                             (cfg.height, cfg.width), jnp.uint32(0),
                             differentiable=True, march_impl=impl,
                             interpret=True)
            return jnp.sum(c.stack(-1) ** 2)

        l0, g0 = jax.value_and_grad(loss)(base, "oracle")
        l1, g1 = jax.value_and_grad(loss)(base, "fused")
        assert float(l0) == float(l1)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fused_diff_composes_with_remat(self, setup):
        """jax.checkpoint over the fused-march render (the O(1)-in-spp
        memory recipe of train_step_sharded) leaves grads unchanged."""
        scene, cfg, corners, render_patch = setup
        base = scene.init_params()
        origin = (jnp.int32(0), jnp.int32(0))

        def one(params):
            c = render_patch(scene, params, cfg, corners, origin,
                             (cfg.height, cfg.width), jnp.uint32(0),
                             differentiable=True, march_impl="fused",
                             interpret=True)
            return jnp.sum(c.stack(-1) ** 2)

        g0 = jax.grad(one)(base)
        g1 = jax.grad(jax.checkpoint(one))(base)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestBatchedSppAndRematPolicy:
    """The train-path fast lane: batched-spp rendering + the march-saving
    remat policy (`diff.march.march_save_policy`)."""

    def test_render_patch_spp_matches_serial(self):
        """Folding the sample axis into rows must reproduce the serial
        per-sample sum bitwise (same RNG streams, one axis-sum)."""
        from raymarchrenderer_tpu.render.integrator import (render_patch,
                                                            render_patch_spp)
        scene = sphere_on_floor()
        cfg = RenderConfig(width=32, height=16, max_steps=48, max_bounces=2,
                           max_dist=100.0)
        corners = Camera(aspect=2.0).corner_rays_flat()
        params = scene.init_params()
        origin = (jnp.int32(0), jnp.int32(0))
        acc = None
        for s in range(3):
            c = render_patch(scene, params, cfg, corners, origin, (16, 32),
                             jnp.uint32(s)).stack(-1)
            acc = c if acc is None else acc + c
        batched = render_patch_spp(scene, params, cfg, corners, origin,
                                   (16, 32), jnp.uint32(0), 3).stack(-1)
        np.testing.assert_array_equal(np.asarray(acc), np.asarray(batched))

    def test_march_save_policy_elides_march_recompute(self):
        """With `march_save_policy`, the remat backward replay must NOT
        re-run the march: the Pallas call count in the grad jaxpr equals
        the no-remat count (the march planes are saved residuals), while
        a plain save-nothing remat doubles it."""
        from raymarchrenderer_tpu.diff.march import march_save_policy
        from raymarchrenderer_tpu.render.integrator import render_patch_spp
        scene = sphere_on_floor()
        cfg = RenderConfig(width=128, height=8, max_steps=16, max_bounces=3,
                           max_dist=100.0)
        corners = Camera(aspect=16.0).corner_rays_flat()
        params = scene.init_params()
        origin = (jnp.int32(0), jnp.int32(0))

        def make(policy):
            def fwd(p):
                c = render_patch_spp(scene, p, cfg, corners, origin,
                                     (8, 128), jnp.uint32(0), 2,
                                     differentiable=True,
                                     march_impl="fused", interpret=True)
                return jnp.sum(c.stack(-1) ** 2)
            if policy is not None:
                fwd = jax.checkpoint(fwd, policy=policy)
            return jax.grad(fwd)

        base = str(jax.make_jaxpr(make(None))(params)).count("pallas_call")
        plain = str(jax.make_jaxpr(
            make(jax.checkpoint_policies.nothing_saveable))(params)) \
            .count("pallas_call")
        saved = str(jax.make_jaxpr(make(march_save_policy()))(params)) \
            .count("pallas_call")
        assert base > 0
        assert plain == 2 * base          # replay re-marches
        assert saved == base              # replay DCEs the march

    def test_policy_remat_grads_equal_no_remat(self):
        """The march-saving policy is a pure memory/schedule change —
        gradients are bitwise-identical to no remat at all."""
        from raymarchrenderer_tpu.diff.march import march_save_policy
        from raymarchrenderer_tpu.render.integrator import render_patch_spp
        scene = sphere_on_floor()
        cfg = RenderConfig(width=32, height=16, max_steps=48, max_bounces=2,
                           max_dist=100.0)
        corners = Camera(aspect=2.0).corner_rays_flat()
        base = scene.init_params()
        origin = (jnp.int32(0), jnp.int32(0))

        def fwd(p):
            c = render_patch_spp(scene, p, cfg, corners, origin, (16, 32),
                                 jnp.uint32(0), 2, differentiable=True,
                                 march_impl="fused", interpret=True)
            return jnp.sum(c.stack(-1) ** 2)

        g0 = jax.grad(fwd)(base)
        g1 = jax.grad(jax.checkpoint(fwd, policy=march_save_policy()))(base)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestRecordedDifferentiable:
    """The round-3 production differentiable path: the WHOLE forward trace
    (every bounce's march + every shadow march) runs as ONE Pallas launch
    (`kernels.record.trace_record_fused`) and the XLA side replays only
    the shade chain over the recorded geometry with the shared implicit
    adjoint (`trace_rgb(march_impl="recorded")`)."""

    @pytest.fixture(scope="class")
    def setup(self):
        from raymarchrenderer_tpu.render.integrator import render_patch_spp
        cfg = RenderConfig(width=64, height=32, spp=1, max_steps=96,
                           max_bounces=3, max_dist=100.0)
        corners = Camera(aspect=2.0).corner_rays_flat()
        return cfg, corners, render_patch_spp

    def _loss(self, scene, cfg, corners, rps, impl, dl, rng_s=0, spp=2):
        def loss(params):
            c = rps(scene, params, cfg, corners, (0, 0),
                    (cfg.height, cfg.width), jnp.uint32(rng_s), spp,
                    direct_light=dl, differentiable=True, march_impl=impl,
                    interpret=True)
            return jnp.sum(c.stack(-1) ** 2)
        return loss

    def test_recorded_grads_bitwise_equal_oracle(self, setup):
        """Without NEE the recorded forward is bitwise the oracle path:
        same march (the kernel body IS the oracle march), same replay."""
        cfg, corners, rps = setup
        scene = sphere_on_floor()
        base = scene.init_params()
        l0, g0 = jax.value_and_grad(
            self._loss(scene, cfg, corners, rps, "oracle", False))(base)
        l1, g1 = jax.value_and_grad(
            self._loss(scene, cfg, corners, rps, "recorded", False))(base)
        assert float(l0) == float(l1)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_recorded_nee_grads_match_oracle(self, setup):
        """With NEE, the recorded and per-bounce paths are the same
        estimator but not bitwise: the kernel derives the shadow geometry
        (o_sh, ldir, dist_l) under Mosaic and the oracle under XLA, whose
        FMA contraction differs at ulp level — grazing shadow rays near
        CSG edges can flip `lit` on a handful of lanes (the oracle itself
        flips the same lanes between eager and jit).  The loss agrees to
        float32 noise; per-leaf grads to ~1% (a few flipped lanes out of
        thousands).  The no-NEE twin above is bitwise."""
        from raymarchrenderer_tpu.scene.builtin import csg_demo
        cfg, corners, rps = setup
        scene = csg_demo()
        base = scene.init_params()
        l0, g0 = jax.value_and_grad(
            self._loss(scene, cfg, corners, rps, "oracle", True))(base)
        l1, g1 = jax.value_and_grad(
            self._loss(scene, cfg, corners, rps, "recorded", True))(base)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            a, b = np.asarray(a), np.asarray(b)
            tol = 2e-2 * max(1e-6, float(np.abs(a).max()))
            np.testing.assert_allclose(a, b, atol=tol)

    def test_recorded_composes_with_remat_policy(self, setup):
        """march_save_policy over the recorded render: the banked planes
        are the saved residuals, the backward replay never re-launches the
        recording kernel, grads unchanged."""
        from raymarchrenderer_tpu.diff.march import march_save_policy
        cfg, corners, rps = setup
        scene = sphere_on_floor()
        base = scene.init_params()
        one = self._loss(scene, cfg, corners, rps, "recorded", False)
        g0 = jax.grad(one)(base)
        g1 = jax.grad(jax.checkpoint(one, policy=march_save_policy()))(base)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_recorded_with_rr(self, setup):
        """RR in the recording kernel keys like the oracle, so the replay's
        RR decisions agree; the primal is bitwise, grads to a few ulp (the
        recorded replay unrolls the bounce loop statically while the
        per-bounce path uses fori_loop, so backward sums reassociate)."""
        cfg, corners, rps = setup
        cfg = cfg.replace(rr_start_bounce=1, rr_min_prob=0.05)
        from raymarchrenderer_tpu.scene.builtin import cornell
        scene = cornell()
        base = scene.init_params()
        l0, g0 = jax.value_and_grad(
            self._loss(scene, cfg, corners, rps, "oracle", False))(base)
        l1, g1 = jax.value_and_grad(
            self._loss(scene, cfg, corners, rps, "recorded", False))(base)
        assert float(l0) == float(l1)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=5e-7)


def test_recorder_wavefront_banks_match_mega():
    """The bounce-synchronous wavefront recorder (the fallback branch of
    `trace_record_fused`) and the megakernel-schedule recorder must bank
    the SAME residual planes — they restate the same trace.  This also
    keeps the otherwise-unreached wavefront branch under test."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raymarchrenderer_tpu.core.rng import RNGStream
    from raymarchrenderer_tpu.core.vecmath import Vec3
    from raymarchrenderer_tpu.kernels.record import trace_record_fused
    from raymarchrenderer_tpu.render.raygen import (eye_vec, pixel_grid,
                                                    primary_rays)
    from raymarchrenderer_tpu.scene.builtin import csg_demo
    scene = csg_demo()
    params = scene.init_params()
    cfg = RenderConfig(width=64, height=32, max_steps=96, max_bounces=3,
                       max_dist=100.0)
    corners = Camera(aspect=2.0).corner_rays_flat()
    px, py = pixel_grid(cfg.width, cfg.height)
    rng = RNGStream(cfg.seed, px, py, jnp.uint32(0), jnp.uint32(1 << 20))
    d = primary_rays(corners, px, py, cfg.width, cfg.height, rng)
    e = eye_vec(corners)
    shape = (cfg.height, cfg.width)
    eye = Vec3(jnp.broadcast_to(e.x, shape), jnp.broadcast_to(e.y, shape),
               jnp.broadcast_to(e.z, shape))
    a = trace_record_fused(scene, params, cfg, eye, d, px, py,
                           jnp.uint32(0), direct_light=True,
                           interpret=True, mode="wavefront")
    b = trace_record_fused(scene, params, cfg, eye, d, px, py,
                           jnp.uint32(0), direct_light=True,
                           interpret=True, corners=corners, mode="mega")
    assert set(a) == set(b) == {"t", "mid", "hit", "sd"}
    # tolerance, not bitwise: the wavefront recorder marches the d0/eye
    # planes the caller computed in XLA while the mega recorder
    # REGENERATES primary rays in-kernel (same RNG keys, different
    # compilation → 1-2 ulp direction differences even at bounce 0), and
    # later bounces' origins come from the two recorders' shade chains —
    # an ulp origin shift moves a hit to the neighbouring march step
    # (≤ ~1e-3·ω in t) on a small fraction of lanes
    dt = np.abs(np.asarray(a["t"]) - np.asarray(b["t"]))
    assert float(dt.max()) < 5e-3, float(dt.max())
    for k in ("mid", "hit"):
        frac = (np.asarray(a[k]) != np.asarray(b[k])).mean()
        assert frac < 5e-3, (k, frac)
    sd_frac = (np.asarray(a["sd"]) != np.asarray(b["sd"])).mean()
    assert sd_frac < 5e-3, sd_frac


class TestSpectralDiff:
    """Round-4 differentiable spectral transport: the band filter is
    reparameterized (continuous wavelength draw + smooth-boxcar
    transmission, `_apply_band_soft`), so gradients reach the band-table
    rows.  FD-checked, and a band EDGE is recovered by SGD."""

    def _setup(self):
        from raymarchrenderer_tpu.render.spectral_integrator import (
            band_table, spectral_demo)
        scene, params, mats = spectral_demo()
        cfg = RenderConfig(width=64, height=16, max_steps=48,
                           max_bounces=3, max_dist=100.0)
        corners = Camera(aspect=4.0).corner_rays_flat()
        return scene, params, mats, cfg, corners

    def test_band_gradient_fd(self):
        """Analytic d(loss)/d(max_wave) matches central differences of the
        soft-mode loss (CRN: fixed sample batch -> deterministic)."""
        from raymarchrenderer_tpu.render.spectral_integrator import (
            SpectralMaterials, render_patch_spp_spectral)
        scene, params, mats, cfg, corners = self._setup()
        origin = (jnp.int32(0), jnp.int32(0))

        def loss(maxw):
            m = SpectralMaterials(mats.min_wave,
                                  mats.max_wave.at[2].set(maxw),
                                  mats.power, mats.kind)
            c = render_patch_spp_spectral(
                scene, params, m, cfg, corners, origin, (16, 64),
                jnp.uint32(3), 4, differentiable=True,
                march_impl="oracle", soft_edge=12.0)
            return jnp.mean(c.stack(-1) ** 2)

        x0 = jnp.float32(590.0)
        g = float(jax.grad(loss)(x0))
        eps = 2.0
        fd = (float(loss(x0 + eps)) - float(loss(x0 - eps))) / (2 * eps)
        assert g != 0.0
        assert abs(g - fd) <= 0.15 * max(abs(g), abs(fd)) + 1e-10, (g, fd)

    def test_band_edge_recovery(self):
        """SGD through the sharded spectral step recovers a band edge:
        target rendered with the sphere band ending at 590 nm, fit
        initialized at 680 nm must move most of the way back."""
        from raymarchrenderer_tpu.parallel.sharding import (
            ShardConfig, make_mesh, train_step_spectral_sharded)
        from raymarchrenderer_tpu.render.spectral_integrator import (
            SpectralMaterials, render_patch_spp_spectral)
        scene, params, mats, cfg, corners = self._setup()
        origin = (jnp.int32(0), jnp.int32(0))
        tgt_sum = render_patch_spp_spectral(
            scene, params, mats, cfg, corners, origin, (16, 64),
            jnp.uint32(100), 32)
        target = tgt_sum.stack(-1) / 32.0

        fit = SpectralMaterials(mats.min_wave,
                                mats.max_wave.at[2].set(680.0),
                                mats.power, mats.kind)
        mesh = make_mesh(ShardConfig(tile=2, spp=2))
        start = float(fit.max_wave[2])
        p = params
        with mesh:
            for k in range(35):
                # fresh Monte-Carlo batch per step (sample0) — re-using
                # one batch would fit its noise, not the band edge
                loss, p, fit = train_step_spectral_sharded(
                    scene, p, fit, cfg, corners, target, mesh, spp=8,
                    lr=1e-3, lr_bands_nm=4.0, march_impl="oracle",
                    sample0=1000 + k * 8)
        end = float(fit.max_wave[2])
        assert np.isfinite(float(loss))
        # travelled most of the way 680 -> 590 and did not overshoot
        # into the noise floor (measured trajectory: ~608 at step 35,
        # ~600 at step 50)
        assert end < start - 50.0, (start, end)
        assert end > 540.0, end


class TestRecordedEnvMap:
    """Round-5: env-map scenes RECORD (the recorder skips the sky eval —
    geometry only — and trace_rgb's recorded replay computes the equirect
    gather differentiably in XLA).  Previously these scenes silently
    downgraded to the per-bounce fused path."""

    def _setup(self):
        from raymarchrenderer_tpu.scene import builtin
        rng = np.random.RandomState(11)
        img = rng.uniform(0.0, 2.0, (8, 16, 3)).astype(np.float32)
        b = builtin.SceneBuilder()
        m = b.diffuse([0.6, 0.5, 0.4])
        b.sphere(m, [0.0, 1.0, 0.0], 1.0)
        b.box(m, [0.0, -0.05, 0.0], [8.0, 0.05, 8.0])
        scene = b.build(env_image=img)
        cfg = RenderConfig(width=64, height=32, spp=1, max_steps=96,
                           max_bounces=3, max_dist=100.0)
        corners = Camera(aspect=2.0).corner_rays_flat()
        return scene, cfg, corners

    def _loss(self, scene, cfg, corners, impl):
        from raymarchrenderer_tpu.render.integrator import render_patch_spp

        def loss(params):
            c = render_patch_spp(scene, params, cfg, corners, (0, 0),
                                 (cfg.height, cfg.width), jnp.uint32(0), 2,
                                 differentiable=True, march_impl=impl,
                                 interpret=True)
            return jnp.sum(c.stack(-1) ** 2)
        return loss

    def test_env_recorded_matches_oracle(self):
        scene, cfg, corners = self._setup()
        base = scene.init_params()
        l0, g0 = jax.value_and_grad(
            self._loss(scene, cfg, corners, "oracle"))(base)
        l1, g1 = jax.value_and_grad(
            self._loss(scene, cfg, corners, "recorded"))(base)
        # the two march implementations differ at ulp level, and a hit
        # point shifted by an ulp moves the bounce direction's bilinear
        # sky weights — redistributing ~1e-3 of a texel's gradient to its
        # neighbor (measured max rel 1.2e-3 on 1.3% of texels); the same
        # class as the documented NEE divergence above
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-4)
        # the env texture itself must receive gradient through the replay
        genv = np.asarray(g1["env"]["image"])
        assert genv.shape == (8, 16, 3) and np.isfinite(genv).all()
        assert float(np.abs(genv).sum()) > 0.0


class TestSpectralRecorded:
    """Round-5: the spectral recorder (ONE Pallas launch for every
    (sample, bounce) march) + XLA band/splat replay must produce the same
    loss and gradients — scene params AND band-table rows — as the
    per-bounce differentiable spectral path."""

    def test_spectral_recorded_grads_match_oracle(self):
        from raymarchrenderer_tpu.render.spectral_integrator import (
            SpectralMaterials, render_patch_spp_spectral, spectral_demo)
        scene, params, mats = spectral_demo()
        cfg = RenderConfig(width=64, height=32, max_steps=96,
                           max_bounces=3, max_dist=100.0)
        corners = Camera(aspect=2.0).corner_rays_flat()

        def loss(impl):
            def f(fit):
                p, bands = fit
                m = SpectralMaterials(bands[0], bands[1], bands[2],
                                      mats.kind)
                c = render_patch_spp_spectral(
                    scene, p, m, cfg, corners, (0, 0),
                    (cfg.height, cfg.width), jnp.uint32(0), 2,
                    differentiable=True, march_impl=impl, interpret=True)
                return jnp.sum(c.stack(-1) ** 2)
            return f

        fit = (params, (mats.min_wave, mats.max_wave, mats.power))
        l0, g0 = jax.value_and_grad(loss("oracle"))(fit)
        l1, g1 = jax.value_and_grad(loss("recorded"))(fit)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-5)
        # band-row gradients must be live (the spectral fit variables)
        g_bands = jax.tree.leaves(g1[1])
        assert any(float(np.abs(np.asarray(g)).sum()) > 0 for g in g_bands)


class TestDispersionRecorded:
    """Round-5: dispersion (separateChannels, `RayMarch.glsl:580-598`)
    records — the megakernel's (sample, channel) path enumeration banks
    per-channel geometry and the replay's channel loop slices it."""

    def test_dispersion_recorded_grads_match_oracle(self):
        from raymarchrenderer_tpu.render.integrator import render_patch_spp
        from raymarchrenderer_tpu.scene.builtin import glass_demo
        scene = glass_demo()
        cfg = RenderConfig(width=64, height=32, max_steps=96,
                           max_bounces=3, max_dist=100.0,
                           separate_channels=True)
        corners = Camera(aspect=2.0).corner_rays_flat()
        base = scene.init_params()

        def loss(impl):
            def f(params):
                c = render_patch_spp(scene, params, cfg, corners, (0, 0),
                                     (cfg.height, cfg.width),
                                     jnp.uint32(0), 2,
                                     differentiable=True, march_impl=impl,
                                     interpret=True)
                return jnp.sum(c.stack(-1) ** 2)
            return f

        l0, g0 = jax.value_and_grad(loss("oracle"))(base)
        l1, g1 = jax.value_and_grad(loss("recorded"))(base)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-4)
