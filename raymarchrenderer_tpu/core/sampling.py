"""Direction sampling: uniform hemisphere/sphere, cosine-weighted, GGX.

Reference parity:
  * `randHemisphere` (`RayMarch3.glsl:202-236`): uniform sphere point via
    theta = 2*pi*u1, phi = acos(2*u2 - 1); flip so z >= 0; rotate into the
    normal's frame built by `makeViewMat` (locZ = normal).  Passing a zero
    normal returns the raw uniform-sphere direction (used by volume scatter,
    `RayMarch.glsl:455`).
  * `makeTBN` (`RayMarch3.glsl:182-200`): tangent = normalize(cross(up, n))
    with a (1,0,0) fallback when n.x == 0; TBN columns (bitangent, normal,
    tangent) — so a y-up sample maps its y onto the normal.
  * `DiffuseMaterial.samplePDF` (`RayMarch2.glsl:279-290`): cosine-weighted
    about +Y (sin^2 theta = u).
  * `GlossyMaterial.samplePDF` (`RayMarch2.glsl:326-342`): GGX half-ish lobe
    about +Y with alpha = roughness^2; roughness == 0 degenerates to mirror
    reflection.
"""
from __future__ import annotations

import jax.numpy as jnp

from .vecmath import Vec3, make_onb, reflect, vselect

_PI = 3.14159265358979323846


def uniform_sphere(u1, u2) -> Vec3:
    theta = 2.0 * _PI * u1
    cos_phi = 2.0 * u2 - 1.0
    sin_phi = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_phi * cos_phi))
    return Vec3(sin_phi * jnp.cos(theta), cos_phi, sin_phi * jnp.sin(theta))


def uniform_hemisphere(u1, u2, normal: Vec3) -> Vec3:
    """Exact `randHemisphere` semantics (flip-to-z>=0 then frame rotate)."""
    b = uniform_sphere(u1, u2)
    b = vselect(b.z < 0.0, -b, b)
    x, y, z = make_onb(normal)
    return x * b.x + y * b.y + z * b.z


def uniform_sphere_or_hemisphere(u1, u2, normal: Vec3) -> Vec3:
    """randHemisphere including the zero-normal pass-through branch."""
    b = uniform_sphere(u1, u2)
    zero_n = (normal.x == 0.0) & (normal.y == 0.0) & (normal.z == 0.0)
    bh = vselect(b.z < 0.0, -b, b)
    x, y, z = make_onb(normal)
    rotated = x * bh.x + y * bh.y + z * bh.z
    return vselect(zero_n, b, rotated)


def make_tbn(normal: Vec3) -> tuple[Vec3, Vec3, Vec3]:
    """(bitangent, normal, tangent) columns of `makeTBN`, vectorized.

    The reference's exact `normal.x == 0` test is reproduced with a where();
    y-up local samples transform as  b*lx + n*ly + t*lz.
    """
    up = Vec3.full(jnp.shape(normal.x), 0.0, 1.0, 0.0)
    fallback = Vec3.full(jnp.shape(normal.x), 1.0, 0.0, 0.0)
    crossed = up.cross(normal)
    tangent = vselect(normal.x == 0.0, fallback, crossed.normalized())
    bitangent = tangent.cross(normal).normalized()
    return bitangent, normal, tangent


def tbn_apply(tbn, local: Vec3) -> Vec3:
    b, n, t = tbn
    return b * local.x + n * local.y + t * local.z


def cosine_hemisphere(u1, u2) -> Vec3:
    """Cosine-weighted about +Y (`DiffuseMaterial.samplePDF`)."""
    sin2 = u1
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2))
    sin_t = jnp.sqrt(sin2)
    o = u2 * 2.0 * _PI
    return Vec3(sin_t * jnp.cos(o), cos_t, sin_t * jnp.sin(o)).normalized()


def ggx_lobe(u1, u2, roughness) -> Vec3:
    """GGX NDF sample about +Y, alpha = roughness^2 (`RayMarch2.glsl:326-342`)."""
    a = roughness * roughness
    o = u1 * 2.0 * _PI
    r = u2
    denom = (a * a - 1.0) * r + 1.0
    # sqrt floors at 1e-12 (not 0): sqrt' -> inf at 0 NaNs the roughness
    # adjoint at the lobe pole.  Primal cost: for roughness -> 0 the lobe
    # degenerates (cos_t == 1 for EVERY r, not just r == 0), so the sin_t
    # floor tilts every draw of a near-smooth lobe by ~1e-6 rad — low bits
    # of near-mirror goldens can flip; exact mirrors (roughness == 0.0)
    # bypass the lobe entirely via glossy_sample's special case
    cos_t = jnp.sqrt(
        jnp.clip((1.0 - r) / jnp.maximum(denom, 1e-12), 1e-12, 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1e-12, 1.0 - cos_t * cos_t))
    return Vec3(sin_t * jnp.cos(o), cos_t, sin_t * jnp.sin(o)).normalized()


def glossy_sample(u1, u2, wo: Vec3, normal: Vec3, roughness) -> Vec3:
    """Glossy direction in the local y-up frame with the reference's
    roughness==0 mirror special case (`RayMarch2.glsl:328-331`).  `wo` is the
    outgoing (toward-eye) direction; reflect matches GLSL reflect(wo, n)."""
    lobe = ggx_lobe(u1, u2, roughness)
    mirror = reflect(wo, normal)
    return vselect(roughness == 0.0, mirror, lobe)


def fresnel_schlick(cos_theta, f0=0.04, scale=0.96, power=5.0):
    """`misc_fresnel` codegen (`Graphics.cpp:461`):
    pow(1 - clamp(dot(n, v), 0, 1), 5) * 0.96 + 0.04."""
    c = jnp.clip(cos_theta, 0.0, 1.0)
    return jnp.power(1.0 - c, power) * scale + f0
