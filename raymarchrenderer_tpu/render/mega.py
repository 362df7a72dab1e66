"""Megakernel path tracer: one unified march+shade loop, per-lane bounces.

The wavefront integrator (`render.integrator.trace_rgb`) synchronizes the
whole batch at every bounce boundary: bounce b's march runs until the LAST
lane of the tile converges, so the total step count is Σ_b max_lanes(steps_b).
On a 2015 GPU that is the natural shape (the reference redispatches per
sample anyway, `Program.cpp:249-259` → `RayMarch3.glsl:356` runs the bounce
loop per thread); on a TPU tile the per-bounce barrier is pure waste — the
straggler lanes of different bounces are DIFFERENT lanes.

This module restates the same per-pixel pipeline (`RayMarch.glsl:483-565`)
as a *megakernel*: every lane carries its own (ray, throughput, bounce
index, lane state) and the single outer `while_loop` costs
max_lanes(Σ_b steps_b) iterations — the straggler sum, not the sum of
stragglers.  Shading (6-eval SDF normal + material graph + RNG, ~10× the
cost of a march step) is NOT done every iteration: lanes that hit park in a
WAIT state and a shade pass runs — under `lax.cond`, so skipped entirely
otherwise — only when waiters outnumber marchers (or no marcher remains).

RNG parity: every random draw is keyed on (seed, px, py, sample, bounce,
slot) exactly like the oracle — `bounce` is a per-lane array here and a loop
scalar there, but the hash is elementwise, so the streams are bitwise
identical and megakernel == oracle to float32 rounding (same multiply
order).  Tested in `tests/test_mega.py`.

Used by `kernels/march.py` (`mode="mega"`) inside the fused Pallas kernel;
also runs as plain jnp (CPU oracle / XLA fallback).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from raymarchrenderer_tpu.core.rng import RNGStream
from raymarchrenderer_tpu.core.vecmath import Vec3, vselect
from raymarchrenderer_tpu.render.config import RenderConfig
from raymarchrenderer_tpu.render.integrator import get_normal
from raymarchrenderer_tpu.scene.graph import Scene
from raymarchrenderer_tpu.scene.nodes import ShadeCtx

# Lane states.  int32 (i1 vector carries don't legalize in Mosaic).
_MARCH = 0   # sphere-tracing the current ray segment
_WAIT = 1    # hit found, parked until the next shade pass
_DONE = 2    # path terminated (emitter / sky / bounce budget / mix kill)


class _MegaState(NamedTuple):
    o: Vec3            # current segment origin
    d: Vec3            # current segment direction
    t: jax.Array       # distance along segment
    thr: Vec3          # multiplicative throughput
    inside: jax.Array  # float 0/1 dielectric-interior flag
    bounce: jax.Array  # int32 per-lane bounce index
    state: jax.Array   # int32 lane state (_MARCH/_WAIT/_DONE)
    steps: jax.Array   # int32 steps spent on current segment
    mid: jax.Array     # int32 material index of parked hit


def trace_mega(scene: Scene, params, cfg: RenderConfig, eye: Vec3, d0: Vec3,
               px, py, sample, channels: Vec3,
               shade_gate: float = 1.0, march_unroll: int = 1) -> Vec3:
    """Megakernel equivalent of `trace_rgb` (no NEE; forward only —
    `lax.while_loop` has no transpose, use `trace_rgb(differentiable=True)`
    for gradients).

    `shade_gate` tunes shade-pass batching: a pass fires when
    n_wait * shade_gate >= n_march.  Larger → more frequent, smaller
    shade passes (less parking delay, more fixed shade overhead).

    `march_unroll` runs K masked march steps per outer iteration: K× fewer
    loop-carry round-trips, reductions and shade-gate branches, at the cost
    of lanes that hit mid-chunk idling ≤K−1 steps.  Pure scheduling — the
    result is bitwise invariant."""
    shape = jnp.shape(d0.x)

    def march_step(st: _MegaState) -> _MegaState:
        marching = st.state == _MARCH
        dist_mult = 1.0 - 2.0 * st.inside
        p = st.o + st.d * st.t
        dist, m = scene.map(params, p, cfg.max_dist)
        dist = dist * dist_mult
        is_hit = marching & (dist < cfg.hit_eps)
        steps = jnp.where(marching, st.steps + 1, st.steps)
        # miss on the PRE-step t (parity with `march`, RayMarch.glsl:233-257)
        # or on step-budget exhaustion (march loop falling off the end).
        is_miss = marching & ~is_hit & (
            (st.t >= cfg.max_dist) | (steps >= cfg.max_steps))
        mid = jnp.where(is_hit, m, st.mid)
        sky = scene.sky(params, st.d)
        thr = vselect(is_miss, st.thr * sky, st.thr)
        state = jnp.where(is_hit, _WAIT,
                          jnp.where(is_miss, _DONE, st.state))
        still = marching & ~is_hit & ~is_miss
        t = jnp.where(still, st.t + dist * cfg.step_multiply, st.t)
        return st._replace(t=t, thr=thr, inside=st.inside, state=state,
                           steps=steps, mid=mid)

    def shade_pass(st: _MegaState) -> _MegaState:
        waiting = st.state == _WAIT
        hitp = st.o + st.d * st.t
        normal = get_normal(scene, params, cfg, hitp)
        rng = RNGStream(cfg.seed, px, py, sample, st.bounce)
        ctx = ShadeCtx(st.o, st.d, st.t, hitp, st.inside, normal, channels,
                       rng)
        s = scene.shade(params, ctx, st.mid)
        thr = vselect(waiting, st.thr * s.color, st.thr)
        new_inside_b = s.inside.x > 0.5
        inside = jnp.where(waiting, new_inside_b.astype(jnp.float32),
                           st.inside)
        term = (s.dir.x == 0.0) & (s.dir.y == 0.0) & (s.dir.z == 0.0)
        bounce = jnp.where(waiting, st.bounce + 1, st.bounce)
        done_now = term | (bounce >= cfg.max_bounces)
        state = jnp.where(waiting,
                          jnp.where(done_now, _DONE, _MARCH), st.state)
        override = (s.hit.x != 0.0) | (s.hit.y != 0.0) | (s.hit.z != 0.0)
        off = jnp.where(new_inside_b, -cfg.inside_offset, cfg.exit_offset)
        o_next = vselect(override, s.hit, hitp + normal * off)
        o = vselect(waiting, o_next, st.o)
        d = vselect(waiting, s.dir, st.d)
        t = jnp.where(waiting, 0.0, st.t)
        steps = jnp.where(waiting, 0, st.steps)
        return _MegaState(o, d, t, thr, inside, bounce, state, steps, st.mid)

    def body(st: _MegaState) -> _MegaState:
        for _ in range(march_unroll):
            st = march_step(st)
        n_march = jnp.sum((st.state == _MARCH).astype(jnp.int32))
        n_wait = jnp.sum((st.state == _WAIT).astype(jnp.int32))
        # Batch shading: amortize the expensive pass over many parked lanes,
        # but never let the tile stall with everyone parked.
        do_shade = (n_wait > 0) & (
            n_wait.astype(jnp.float32) * jnp.float32(shade_gate)
            >= n_march.astype(jnp.float32))
        return lax.cond(do_shade, shade_pass, lambda s: s, st)

    def cond(st: _MegaState):
        return jnp.min(st.state) < _DONE

    init = _MegaState(
        o=eye, d=d0, t=jnp.zeros(shape, jnp.float32), thr=channels,
        inside=jnp.zeros(shape, jnp.float32),
        bounce=jnp.zeros(shape, jnp.int32),
        state=jnp.zeros(shape, jnp.int32),
        steps=jnp.zeros(shape, jnp.int32),
        mid=jnp.full(shape, -1, jnp.int32))
    # Peel one march step so the while_loop carries enter with concrete
    # (non-splat) Mosaic layouts — same reason trace_rgb peels bounce 0.
    st0 = march_step(init)
    out = lax.while_loop(cond, body, st0)
    return out.thr
