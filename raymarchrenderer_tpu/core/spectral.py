"""Spectral transport helpers: wavelength <-> RGB, band sampling.

The gen-3 kernel (`RayMarch3.glsl`) carries per-path state as a single
wavelength (nm, 5 nm bins; 0 == "unset") plus a scalar power.  Materials are
`ColorRange` band filters times a power multiplier (`RayMarch3.glsl:251-345`);
the sky is a 390-830 nm emitter of power 0.015 (`:408-437`); the final splat
is `wavelengthToColor(lambda) * power` (`:447-522`, piecewise linear
spectrum->RGB taken from scienceprimer.com).

We keep wavelengths as float32 (values are integral multiples of 5) so all
arithmetic stays on the VPU fast path; "unset" is 0.0.
"""
from __future__ import annotations

import jax.numpy as jnp

from .vecmath import Vec3


def wavelength_to_rgb(wl) -> Vec3:
    """Piecewise-linear spectrum->RGB, exact parity with
    `wavelengthToColor` (`RayMarch3.glsl:447-522`) including the edge-fade
    alpha rolloff.  `wl` in nm; out-of-gamut wavelengths map to black."""
    wl = jnp.asarray(wl, jnp.float32)

    r = jnp.where((wl >= 380) & (wl < 440), -(wl - 440.0) / (440.0 - 380.0), 0.0)
    r = jnp.where((wl >= 510) & (wl < 580), (wl - 510.0) / (580.0 - 510.0), r)
    r = jnp.where((wl >= 580) & (wl < 645), 1.0, r)
    r = jnp.where((wl >= 645) & (wl <= 780), 1.0, r)

    g = jnp.where((wl >= 440) & (wl < 490), (wl - 440.0) / (490.0 - 440.0), 0.0)
    g = jnp.where((wl >= 490) & (wl < 510), 1.0, g)
    g = jnp.where((wl >= 510) & (wl < 580), 1.0, g)
    g = jnp.where((wl >= 580) & (wl < 645), -(wl - 645.0) / (645.0 - 580.0), g)

    b = jnp.where((wl >= 380) & (wl < 440), 1.0, 0.0)
    b = jnp.where((wl >= 440) & (wl < 490), 1.0, b)
    b = jnp.where((wl >= 490) & (wl < 510), -(wl - 510.0) / (510.0 - 490.0), b)

    alpha = jnp.where((wl > 780) | (wl < 380), 0.0, 1.0)
    alpha = jnp.where((wl > 700) & (wl <= 780), (780.0 - wl) / (780.0 - 700.0), alpha)
    alpha = jnp.where((wl < 420) & (wl >= 380), (wl - 380.0) / (420.0 - 380.0), alpha)

    return Vec3(r * alpha, g * alpha, b * alpha)


def sample_band(u, min_wave, max_wave):
    """Sample a wavelength from a band in 5 nm bins, parity with the
    `mat_func_*` emitters (`RayMarch3.glsl:261-266`):
    r = u * (max-min)/5; wl = floor(r)*5 + min."""
    r = u * (max_wave - min_wave) / 5.0
    return jnp.floor(r) * 5.0 + min_wave


def band_filter(wl, power, min_wave, max_wave, mat_power):
    """Apply a ColorRange band filter (`RayMarch3.glsl:268-280` else-branch):
    wavelengths outside [min, max] are killed (wl -> 0, path terminates);
    inside, power *= mat_power.  Returns (wl, power, absorbed?)."""
    inside = (wl >= min_wave) & (wl <= max_wave)
    new_wl = jnp.where(inside, wl, 0.0)
    new_power = jnp.where(inside, power * mat_power, power)
    return new_wl, new_power, ~inside
