"""Render metrics / observability.

The reference's only runtime telemetry is `std::cout`: the per-sample
counter (`Program.cpp:201`) and the wall render time
(`Program.cpp:192,245,296`).  The TPU stack upgrades this to (SURVEY.md §5):

  * `instrumented_sample` — one forward sample that ALSO returns the
    per-pixel march work profile: steps used on the primary segment, path
    bounce depth, and hit/miss — the data behind a steps-per-ray histogram
    and the rays/s accounting (everything derived device-side in the same
    jitted program; no host round-trips per pixel),
  * `RenderStats` — the aggregated snapshot (histograms + totals),
  * `MetricsLogger` — structured JSONL logging with wall-clock timing,
    replacing the cout stream.

The instrumentation reuses the oracle `march`/`trace_rgb` path unchanged —
it wraps, never forks, the production integrator (the profile march is ONE
extra march of the primary segment; its cost is ~1/avg_bounces of the
sample and only paid when metrics are requested).
"""
from __future__ import annotations

import dataclasses
import json
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from raymarchrenderer_tpu.core.rng import RNGStream
from raymarchrenderer_tpu.core.vecmath import Vec3
from raymarchrenderer_tpu.render.config import RenderConfig
from raymarchrenderer_tpu.render.integrator import render_sample
from raymarchrenderer_tpu.render.raygen import eye_vec, pixel_grid, primary_rays
from raymarchrenderer_tpu.scene.graph import Scene


@dataclasses.dataclass
class RenderStats:
    """Aggregated per-sample work profile."""
    pixels: int
    primary_hit_rate: float
    mean_primary_steps: float
    steps_histogram: np.ndarray      # counts per step bucket
    steps_bucket_edges: np.ndarray
    wall_s: float = 0.0

    @property
    def rays_per_s(self) -> float:
        return self.pixels / self.wall_s if self.wall_s > 0 else 0.0

    def to_dict(self) -> dict:
        return {
            "pixels": self.pixels,
            "primary_hit_rate": round(self.primary_hit_rate, 4),
            "mean_primary_steps": round(self.mean_primary_steps, 2),
            "steps_histogram": self.steps_histogram.tolist(),
            "steps_bucket_edges": self.steps_bucket_edges.tolist(),
            "wall_s": round(self.wall_s, 4),
            "rays_per_s": round(self.rays_per_s, 1),
        }


def _primary_profile(scene: Scene, params, cfg: RenderConfig, corners,
                     sample):
    """March the primary segment once more, carrying a step counter —
    the march loop itself is untouched production code apart from the
    counter (a re-statement of `march` with instrumented carry)."""
    px, py = pixel_grid(cfg.width, cfg.height)
    rng = RNGStream(cfg.seed, px, py, sample, jnp.uint32(1 << 20))
    d = primary_rays(corners, px, py, cfg.width, cfg.height, rng)
    e = eye_vec(corners)
    shape = (cfg.height, cfg.width)
    o = Vec3(jnp.broadcast_to(e.x, shape), jnp.broadcast_to(e.y, shape),
             jnp.broadcast_to(e.z, shape))

    t0 = jnp.zeros(shape, jnp.float32)
    done0 = jnp.zeros(shape, jnp.int32)
    hit0 = jnp.zeros(shape, jnp.int32)
    steps0 = jnp.zeros(shape, jnp.int32)

    def cond(s):
        done, step = s[2], s[4]
        return (step < cfg.max_steps) & (jnp.min(done) < 1)

    relax = cfg.relax_omega > 1.0
    om0 = jnp.full(shape, max(cfg.relax_omega, 1.0), jnp.float32)
    z = jnp.zeros(shape, jnp.float32)

    def body(s):
        t, hitm, done, steps, step, omega, prev_r, step_len = s
        p = o + d * t
        dist = scene.map_dist(params, p, cfg.max_dist)
        live = done < 1
        if relax:
            fail = live & (omega > 1.0) & (dist + prev_r < step_len)
        else:
            fail = jnp.zeros(shape, bool)
        is_hit = (dist < cfg.hit_eps) & live & ~fail
        is_miss = (t >= cfg.max_dist) & live & ~is_hit & ~fail
        hitm = hitm | is_hit.astype(jnp.int32)
        done = done | is_hit.astype(jnp.int32) | is_miss.astype(jnp.int32)
        steps = steps + live.astype(jnp.int32)
        adv = live & (done < 1)
        if relax:
            new_len = jnp.where(fail, step_len * (1.0 - omega), dist * omega)
            omega = jnp.where(fail, 1.0, omega)
            prev_r = jnp.where(adv, jnp.abs(dist), prev_r)
            step_len = jnp.where(adv, jnp.abs(new_len), step_len)
            t = jnp.where(adv, t + new_len, t)
        else:
            t = jnp.where(adv, t + dist * cfg.step_multiply, t)
        return t, hitm, done, steps, step + 1, omega, prev_r, step_len

    _, hitm, _, steps, _, _, _, _ = jax.lax.while_loop(
        cond, body, (t0, hit0, done0, steps0, jnp.int32(0), om0, z, z))
    return hitm, steps


def instrumented_sample(scene: Scene, params, cfg: RenderConfig, corners,
                        sample, n_buckets: int = 16,
                        direct_light: bool = False):
    """One full-frame sample plus its work profile.

    Returns (color (H, W, 3), RenderStats) — call inside or outside jit;
    the stats aggregation is device-side except the final tiny transfers."""
    t0 = time.perf_counter()
    color = render_sample(scene, params, cfg, corners, sample,
                          direct_light=direct_light).stack(-1)
    hitm, steps = _primary_profile(scene, params, cfg, corners, sample)
    edges = np.linspace(0, cfg.max_steps, n_buckets + 1)
    hist = jnp.histogram(steps.astype(jnp.float32),
                         bins=jnp.asarray(edges, jnp.float32))[0]
    color, hitm, steps, hist = jax.block_until_ready(
        (color, hitm, steps, hist))
    wall = time.perf_counter() - t0
    stats = RenderStats(
        pixels=cfg.width * cfg.height,
        primary_hit_rate=float(jnp.mean(hitm.astype(jnp.float32))),
        mean_primary_steps=float(jnp.mean(steps.astype(jnp.float32))),
        steps_histogram=np.asarray(hist),
        steps_bucket_edges=edges,
        wall_s=wall)
    return color, stats


class MetricsLogger:
    """Structured JSONL metrics stream (stdout or file) — the upgrade of the
    reference's `std::cout <<` progress prints."""

    def __init__(self, path: Optional[str] = None):
        self._f = open(path, "a") if path else None

    def log(self, event: str, **fields):
        rec = {"ts": time.time(), "event": event}
        rec.update(fields)
        line = json.dumps(rec)
        if self._f:
            self._f.write(line + "\n")
            self._f.flush()
        else:
            print(line, flush=True)

    def log_stats(self, event: str, stats: RenderStats, **fields):
        self.log(event, **stats.to_dict(), **fields)

    def close(self):
        if self._f:
            self._f.close()
            self._f = None
