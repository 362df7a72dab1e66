"""Probe: env-map lookup strategies at production size on the real chip.

The round-3 measured wall is the XLA:TPU equirect gather in the deferred-sky
composite (~10M taps/s, latency-bound — docs/performance.md).  This probe
times candidate replacements on PRODUCTION-SIZED jitted calls (the axon
tunnel under-reports micro timings):

  a) sky_uv GL_LINEAR (4-tap 2D advanced indexing)  — the current wall
  b) flat 1-D row take, nearest                      — layout hypothesis
  c) one-hot nearest matmul vs K=2048 table          — MXU gather
  d) tent-weight bilinear matmul vs K=2048 (32x64)   — MXU gather, GL_LINEAR
     footprint on the downfiltered table
  e) tent-weight bilinear matmul vs K=8192 (64x128)

N = 32 * 1024 * 1024 slots (one K_BANK=32 chunk of the 1024^2 env bench).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 512, 1024
KH, KW = 32, 64
KH2, KW2 = 64, 128
N = 32 * 1024 * 1024

v = np.linspace(0.0, 1.0, H)[:, None, None]
img = (np.array([0.3, 0.5, 1.0]) * (1 - v) + np.array([1.0, 0.6, 0.2]) * v)
img = np.broadcast_to(img, (H, W, 3)).astype(np.float32)
img_j = jnp.asarray(img)

rng = np.random.default_rng(0)
u = jnp.asarray(rng.random(N, dtype=np.float32))
vv = jnp.asarray(rng.random(N, dtype=np.float32))


def downfilter(img, kh, kw):
    h, w, _ = img.shape
    return img.reshape(kh, h // kh, kw, w // kw, 3).mean((1, 3))


tab1 = jnp.asarray(downfilter(img, KH, KW).reshape(KH * KW, 3))
tab2 = jnp.asarray(downfilter(img, KH2, KW2).reshape(KH2 * KW2, 3))


def sky_uv_linear(u, v):
    x = u * W - 0.5
    y = jnp.clip(v * H - 0.5, 0.0, H - 1.0)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    x0 = jnp.mod(x0f.astype(jnp.int32), W)
    x1 = jnp.mod(x0 + 1, W)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    t00 = img_j[y0, x0]
    t10 = img_j[y0, x1]
    t01 = img_j[y1, x0]
    t11 = img_j[y1, x1]
    fx = fx[..., None]
    fy = fy[..., None]
    return ((t00 * (1 - fx) + t10 * fx) * (1 - fy)
            + (t01 * (1 - fx) + t11 * fx) * fy)


def flat_take_nearest(u, v):
    x0 = jnp.mod(jnp.floor(u * W).astype(jnp.int32), W)
    y0 = jnp.clip(jnp.floor(v * H).astype(jnp.int32), 0, H - 1)
    flat = img_j.reshape(H * W, 3)
    return jnp.take(flat, y0 * W + x0, axis=0)


def onehot_nearest(u, v):
    x0 = jnp.mod(jnp.floor(u * KW).astype(jnp.int32), KW)
    y0 = jnp.clip(jnp.floor(v * KH).astype(jnp.int32), 0, KH - 1)
    idx = y0 * KW + x0
    oh = (idx[:, None] == jnp.arange(KH * KW)[None, :]).astype(jnp.float32)
    return oh @ tab1


def tent_bilinear(u, v, kh, kw, tab):
    # sample point in texel units of the small table, centers at +0.5
    x = u * kw - 0.5
    y = jnp.clip(v * kh - 0.5, 0.0, kh - 1.0)
    # weight vs every texel COLUMN center: tent(|x - cx|) with phi wrap
    cx = jnp.arange(kw, dtype=jnp.float32)
    cy = jnp.arange(kh, dtype=jnp.float32)
    dx = jnp.abs(x[:, None] - cx[None, :])
    dx = jnp.minimum(dx, kw - dx)              # wrap in u
    wu = jnp.maximum(0.0, 1.0 - dx)            # (N, kw)
    dyy = jnp.abs(y[:, None] - cy[None, :])
    wv_ = jnp.maximum(0.0, 1.0 - dyy)          # (N, kh)
    # clamp-to-edge rows: renormalize so edge rows absorb the pole half
    wv_ = wv_ / jnp.maximum(wv_.sum(-1, keepdims=True), 1e-20)
    w_full = (wv_[:, :, None] * wu[:, None, :]).reshape(-1, kh * kw)
    return w_full @ tab


variants = {
    "a_gather_linear": jax.jit(sky_uv_linear),
    "b_flat_take_nearest": jax.jit(flat_take_nearest),
    "c_onehot_nearest_2048": jax.jit(onehot_nearest),
    "d_tent_bilinear_2048": jax.jit(lambda u, v: tent_bilinear(u, v, KH, KW, tab1)),
    "e_tent_bilinear_8192": jax.jit(lambda u, v: tent_bilinear(u, v, KH2, KW2, tab2)),
}

out = {}
for name, fn in variants.items():
    try:
        r = fn(u, vv)
        jax.block_until_ready(r)
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(u, vv))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        out[name] = {"s": round(dt, 4), "Mlookups_per_s": round(N / dt / 1e6, 1)}
    except Exception as e:  # noqa: BLE001
        out[name] = {"error": str(e)[:200]}
    print(name, out[name], flush=True)

print(json.dumps(out))
