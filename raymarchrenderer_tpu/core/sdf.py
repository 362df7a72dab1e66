"""Signed distance field primitives, CSG operators and domain operators.

Pure elementwise jnp over structure-of-arrays points, so every function works
both in jitted whole-image code and inside Pallas kernel bodies.

Reference parity:
  * sphere/box: `RayMarch3.glsl:115-125` (and `RayMarch.glsl:170-180`)
  * union/subtract/intersect: `RayMarch.glsl:183-196`
  * smooth min: `RayMarch.glsl:115-119` (polynomial smin)
  * domain repeat: `RayMarch.glsl:199-215`
  * material-tagged union opU on (dist, matID): `RayMarch3.glsl:127-130`

Extra primitives (plane, torus, cylinder, capsule, rounding) are standard
Inigo Quilez formulas — they extend the reference's library without changing
its semantics for the shapes it has.
"""
from __future__ import annotations

import jax.numpy as jnp

from .vecmath import Vec3


# -- primitives ---------------------------------------------------------------
def sd_sphere(p: Vec3, centre: Vec3, radius):
    """`map_sphere` RayMarch3.glsl:115-119."""
    q = p - centre
    return q.length() - radius


def sd_box(p: Vec3, centre: Vec3, half_extent: Vec3):
    """`map_box` RayMarch3.glsl:121-125 (exact, incl. interior distance)."""
    q = (p - centre).abs() - half_extent
    outside = q.maximum(0.0).length()
    inside = jnp.minimum(q.max_component(), 0.0)
    return inside + outside


def sd_plane(p: Vec3, normal: Vec3, offset):
    return p.dot(normal) - offset


def sd_torus(p: Vec3, centre: Vec3, major, minor):
    q = p - centre
    ql = jnp.sqrt(q.x * q.x + q.z * q.z) - major
    return jnp.sqrt(ql * ql + q.y * q.y) - minor


def sd_cylinder(p: Vec3, centre: Vec3, radius, half_height):
    q = p - centre
    dxz = jnp.sqrt(q.x * q.x + q.z * q.z) - radius
    dy = jnp.abs(q.y) - half_height
    out = jnp.sqrt(jnp.maximum(dxz, 0.0) ** 2 + jnp.maximum(dy, 0.0) ** 2)
    return jnp.minimum(jnp.maximum(dxz, dy), 0.0) + out


def sd_capsule(p: Vec3, a: Vec3, b: Vec3, radius):
    pa = p - a
    ba = b - a
    h = jnp.clip(pa.dot(ba) / jnp.maximum(ba.dot(ba), 1e-30), 0.0, 1.0)
    return (pa - ba * h).length() - radius


def op_round(d, r):
    return d - r


# -- CSG operators ------------------------------------------------------------
def op_union(a, b):
    """`op_union` RayMarch.glsl:183-186."""
    return jnp.minimum(a, b)


def op_subtract(a, b):
    """`op_subtract` RayMarch.glsl:188-191: max(a, -b)."""
    return jnp.maximum(a, -b)


def op_intersect(a, b):
    """`op_intersect` RayMarch.glsl:193-196."""
    return jnp.maximum(a, b)


def smin(a, b, k):
    """Polynomial smooth min, `RayMarch.glsl:115-119` / `RayMarch3.glsl:108-112`."""
    h = jnp.clip(0.5 + 0.5 * (b - a) / k, 0.0, 1.0)
    return (b * (1.0 - h) + a * h) - k * h * (1.0 - h)


def op_union_mat(da, ma, db, mb):
    """Material-tagged union `opU` (`RayMarch3.glsl:127-130`): keep the tag of
    the nearer surface. Returns (dist, matID)."""
    take_a = da < db
    return jnp.where(take_a, da, db), jnp.where(take_a, ma, mb)


# -- domain operators -----------------------------------------------------------
def domain_repeat(p: Vec3, m: Vec3) -> Vec3:
    """`domain_repeat` RayMarch.glsl:199-215: per-axis mod-recentre; an axis
    with period 0 passes through unchanged."""

    def rep(c, period):
        return jnp.where(period != 0.0,
                         jnp.mod(c, jnp.where(period != 0.0, period, 1.0))
                         - period * 0.5,
                         c)

    return Vec3(rep(p.x, m.x), rep(p.y, m.y), rep(p.z, m.z))


def domain_translate(p: Vec3, t: Vec3) -> Vec3:
    return p - t


def domain_scale(p: Vec3, s) -> Vec3:
    return p / s
