"""Differentiable sphere tracing: the reparameterized / detached-march adjoint.

Naive reverse-mode through the march loop is impossible (`lax.while_loop`
has no transpose) and a fixed-length unroll would checkpoint ≤512 iterates of
the whole pixel batch — hostile to HBM.  Instead we differentiate the march
*implicitly*: the converged hit distance t*(θ, o, d) satisfies

    f(o + t* d; θ) = 0            (f = scene SDF, θ = scene parameters)

so by the implicit function theorem

    dt*/dθ = -f_θ / (∇f·d),  dt*/do = -∇f / (∇f·d),  dt*/dd = -t* ∇f / (∇f·d)

evaluated at the (detached) hit point.  The forward pass is the plain masked
`while_loop` march (zero memory overhead, full early-out); the backward pass
is ONE extra SDF evaluation's VJP.  Missed rays get zero gradient (their t is
clamped to max_dist — a constant).

This is the "detached march / reparameterized hit point" adjoint called for
by the north star (BASELINE.json) and SURVEY.md §7 hard-part (b).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from raymarchrenderer_tpu.core.vecmath import Vec3


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def march_diff(scene, cfg, params, o: Vec3, d: Vec3, dist_mult, active):
    """Drop-in replacement for `render.integrator.march` with gradients.

    Returns (t, mat_index, hit_mask); t carries implicit-function gradients
    w.r.t. params / ray origin / ray direction."""
    from raymarchrenderer_tpu.render.integrator import march
    return march(scene, lax.stop_gradient(params), cfg, o, d, dist_mult,
                 active)


def _march_fwd(scene, cfg, params, o, d, dist_mult, active):
    from raymarchrenderer_tpu.render.integrator import march
    t, mid, hitm = march(scene, lax.stop_gradient(params), cfg,
                         lax.stop_gradient(o), lax.stop_gradient(d),
                         dist_mult, active)
    return (t, mid, hitm), (params, o, d, t, hitm & active)


def _implicit_bwd(scene, cfg, res, cots):
    """Shared implicit-function backward: one SDF VJP at the detached hit
    point.  Used by both the oracle (`march_diff`) and the Pallas
    (`march_diff_fused`) forward passes — the adjoint only needs
    (params, o, d, t, valid), not the march trajectory."""
    params, o, d, t, valid = res
    t_bar = cots[0]  # mid/hit cotangents are float0 (int/bool outputs)

    def g(params, ox, oy, oz, dx, dy, dz):
        p = Vec3(ox + dx * t, oy + dy * t, oz + dz * t)
        return scene.map_dist(params, p, cfg.max_dist)

    _, vjp = jax.vjp(g, params, o.x, o.y, o.z, d.x, d.y, d.z)

    # denominator ∇f·d via one more VJP restricted to the position slots
    def fp(px, py, pz):
        return scene.map_dist(lax.stop_gradient(params), Vec3(px, py, pz),
                              cfg.max_dist)

    p = o + d * t
    _, vjp_p = jax.vjp(fp, p.x, p.y, p.z)
    ones = jnp.ones_like(t)
    gx, gy, gz = vjp_p(ones)
    denom = gx * d.x + gy * d.y + gz * d.z
    safe = valid & (jnp.abs(denom) > 1e-6)
    cot = jnp.where(safe, -t_bar / jnp.where(safe, denom, 1.0), 0.0)

    p_bar, ox_b, oy_b, oz_b, dxg, dyg, dzg = vjp(cot)
    # d̄ picks up the extra t-scaling: g_d = t ∇f, already includes t via the
    # chain rule on p = o + d t (dx*t inside g) — vjp handles it.
    o_bar = Vec3(ox_b, oy_b, oz_b)
    d_bar = Vec3(dxg, dyg, dzg)
    zero = jnp.zeros_like(t)
    return p_bar, o_bar, d_bar, zero, None


def _march_bwd(scene, cfg, res, cots):
    return _implicit_bwd(scene, cfg, res, cots)


march_diff.defvjp(_march_fwd, _march_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def march_diff_fused(scene, cfg, interpret, params, o: Vec3, d: Vec3,
                     dist_mult, active):
    """`march_diff` with the forward pass on the fused Pallas kernel
    (`kernels.march.march_fused`: one launch, per-tile early-out) and the
    SAME implicit-function backward (one SDF VJP in plain XLA).

    This is the TPU-fast differentiable march: the forward march — the cost
    center of both passes (`RayMarch3.glsl:145-169`) — runs at megakernel
    rates, and reverse-mode never touches the while_loop.  Gradients are
    bitwise-equal to `march_diff`'s because the Pallas march returns the
    bitwise-identical t (its kernel body IS the oracle march) and the
    adjoint is shared.  `interpret=True` is the CPU test path."""
    from raymarchrenderer_tpu.kernels.march import march_fused
    return march_fused(scene, lax.stop_gradient(params), cfg, o, d,
                       dist_mult, active, interpret=interpret)


def _march_fused_fwd(scene, cfg, interpret, params, o, d, dist_mult, active):
    from raymarchrenderer_tpu.kernels.march import march_fused
    t, mid, hitm = march_fused(scene, lax.stop_gradient(params), cfg,
                               lax.stop_gradient(o), lax.stop_gradient(d),
                               dist_mult, active, interpret=interpret)
    return (t, mid, hitm), (params, o, d, t, hitm & active)


def _march_fused_bwd(scene, cfg, interpret, res, cots):
    return _implicit_bwd(scene, cfg, res, cots)


march_diff_fused.defvjp(_march_fused_fwd, _march_fused_bwd)
