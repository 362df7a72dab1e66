"""Color transfer functions and channel helpers.

The reference keeps a linear RGBA32F accumulation buffer and applies the sRGB
OETF at save time (`Graphics.cpp:761-786`: c<=0.0031308 ? 12.92c :
1.055 c^(1/2.4) - 0.055).  (It *also* enables GL_FRAMEBUFFER_SRGB for display,
a double-gamma quirk we deliberately fix: one explicit OETF at encode time.)

`grayscale` matches `RayMarch.glsl:306-309`: channel mean normalized by the
active channel mask — this is what drives per-channel (dispersion) rendering.
"""
from __future__ import annotations

import jax.numpy as jnp

from .vecmath import Vec3


def linear_to_srgb(c):
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308,
                     c * 12.92,
                     1.055 * jnp.power(jnp.maximum(c, 1e-12), 1.0 / 2.4) - 0.055)


def srgb_to_linear(c):
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.04045,
                     c / 12.92,
                     jnp.power((c + 0.055) / 1.055, 2.4))


def encode_srgb_u8(rgb_linear):
    """Linear float image (..., 3) -> sRGB uint8, single OETF application."""
    srgb = linear_to_srgb(rgb_linear)
    return jnp.round(srgb * 255.0).astype(jnp.uint8)


def grayscale(color: Vec3, channels: Vec3):
    """(r+g+b) / (ch.r+ch.g+ch.b) — RayMarch.glsl:306-309."""
    return color.sum() / channels.sum()
