"""Probe round 2: reshape-free tent matmul + exact-path gather upgrades.

d failed in probe 1 because the separable (N, kh, kw) -> (N, K) product
reshape broke operand fusion (compile-helper crash).  d2 computes the same
tent weights directly on the (N, K) domain from iota-derived (ky, kx) —
no 3-D intermediate, so XLA can stream W tiles into the matmul.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 512, 1024
KH, KW = 32, 64
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


def tent_flat(u, v, kh, kw, tab):
    K = kh * kw
    kk = jnp.arange(K, dtype=jnp.int32)
    cx = (kk % kw).astype(jnp.float32)          # texel column center - 0.5
    cy = (kk // kw).astype(jnp.float32)
    x = u * kw - 0.5
    y = jnp.clip(v * kh - 0.5, 0.0, kh - 1.0)
    dx = jnp.abs(x[:, None] - cx[None, :])
    dx = jnp.minimum(dx, kw - dx)
    dyy = jnp.abs(y[:, None] - cy[None, :])
    wgt = jnp.maximum(0.0, 1.0 - dx) * jnp.maximum(0.0, 1.0 - dyy)
    return wgt @ tab


def onehot4_bilinear(u, v, kh, kw, tab):
    x = u * kw - 0.5
    y = jnp.clip(v * kh - 0.5, 0.0, kh - 1.0)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    x0 = jnp.mod(x0f.astype(jnp.int32), kw)
    x1 = jnp.mod(x0 + 1, kw)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, kh - 1)
    y1 = jnp.clip(y0 + 1, 0, kh - 1)
    kk = jnp.arange(kh * kw, dtype=jnp.int32)[None, :]
    out = jnp.zeros((u.shape[0], 3), jnp.float32)
    for idx, wgt in (((y0, x0), (1 - fx) * (1 - fy)),
                     ((y0, x1), fx * (1 - fy)),
                     ((y1, x0), (1 - fx) * fy),
                     ((y1, x1), fx * fy)):
        flat = (idx[0] * kw + idx[1])[:, None]
        out = out + ((flat == kk).astype(jnp.float32) * wgt[:, None]) @ tab
    return out


# exact full-res GL_LINEAR via one (2,2,3) patch gather on a padded image
img_pad = jnp.asarray(
    np.concatenate([
        np.concatenate([img, img[:, :1]], axis=1),
        np.concatenate([img[-1:], img[-1:, :1]], axis=1)], axis=0))


def patch_gather_linear(u, v):
    x = u * W - 0.5
    y = jnp.clip(v * H - 0.5, 0.0, H - 1.0)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    x0 = jnp.mod(x0f.astype(jnp.int32), W)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    starts = jnp.stack([y0, x0], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    patch = jax.lax.gather(img_pad, starts, dn, slice_sizes=(2, 2, 3))
    t00 = patch[:, 0, 0]
    t10 = patch[:, 0, 1]
    t01 = patch[:, 1, 0]
    t11 = patch[:, 1, 1]
    fx = fx[:, None]
    fy = fy[:, None]
    return ((t00 * (1 - fx) + t10 * fx) * (1 - fy)
            + (t01 * (1 - fx) + t11 * fx) * fy)


def flat_take4_linear(u, v):
    x = u * W - 0.5
    y = jnp.clip(v * H - 0.5, 0.0, H - 1.0)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[:, None]
    fy = (y - y0f)[:, None]
    x0 = jnp.mod(x0f.astype(jnp.int32), W)
    x1 = jnp.mod(x0 + 1, W)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    flat = img_j.reshape(H * W, 3)
    t00 = jnp.take(flat, y0 * W + x0, axis=0)
    t10 = jnp.take(flat, y0 * W + x1, axis=0)
    t01 = jnp.take(flat, y1 * W + x0, axis=0)
    t11 = jnp.take(flat, y1 * W + x1, axis=0)
    return ((t00 * (1 - fx) + t10 * fx) * (1 - fy)
            + (t01 * (1 - fx) + t11 * fx) * fy)


variants = {
    "d2_tent_flat_2048": jax.jit(lambda u, v: tent_flat(u, v, KH, KW, tab1)),
    "f_onehot4_bilinear_2048": jax.jit(
        lambda u, v: onehot4_bilinear(u, v, KH, KW, tab1)),
    "g_patch_gather_linear_exact": jax.jit(patch_gather_linear),
    "h_flat_take4_linear_exact": jax.jit(flat_take4_linear),
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
        out[name] = {"s": round(dt, 4),
                     "Mlookups_per_s": round(N / dt / 1e6, 1)}
    except Exception as e:  # noqa: BLE001
        out[name] = {"error": str(e)[:300]}
    print(name, out[name], flush=True)

# numeric sanity: d2 vs f must agree (same math, different formulation)
try:
    a = variants["d2_tent_flat_2048"](u[:65536], vv[:65536])
    b = variants["f_onehot4_bilinear_2048"](u[:65536], vv[:65536])
    out["d2_vs_f_maxdiff"] = float(jnp.abs(a - b).max())
    print("d2_vs_f_maxdiff", out["d2_vs_f_maxdiff"])
except Exception as e:  # noqa: BLE001
    print("cmp failed", e)

print(json.dumps(out))
