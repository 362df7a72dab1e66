"""Multi-chip sharding: 2-axis ('tile', 'spp') mesh over shard_map.

The renderer's two parallel axes (SURVEY.md §5):
  * image tiles — embarrassingly parallel, no halo (path tracing has no
    pixel-to-pixel dependence): each chip owns a disjoint block of pixel
    rows, replacing the reference's single-GPU spiral chunk dispatch
    (`Program.cpp:196-299`) with spatial sharding.
  * samples-per-pixel — parallel and mergeable by mean: each chip renders a
    disjoint slice of the sample indices and the slices merge with one
    `psum` over the 'spp' axis, replacing the reference's serial
    per-sample loop (`Program.cpp:249-259`).
The bounce loop (the renderer's "sequence dimension") stays per-chip.

Because the RNG is counter-based on absolute (pixel, sample) coordinates,
the sharded render is BITWISE-identical to the single-chip render for any
mesh shape — rendun on 1 chip or 64, same image.  Collectives ride ICI;
nothing crosses DCN except the optional host-0 framebuffer gather.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raymarchrenderer_tpu.render.config import RenderConfig
from raymarchrenderer_tpu.render.integrator import (render_patch,
                                                    render_patch_spp)
from raymarchrenderer_tpu.scene.graph import Scene


@dataclasses.dataclass(frozen=True)
class ShardConfig:
    """How to lay the render over the mesh."""
    tile: int = 1    # chips along the image-row axis
    spp: int = 1     # chips along the sample axis

    def total(self) -> int:
        return self.tile * self.spp


def make_mesh(shard: ShardConfig, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    n = shard.total()
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(shard.tile, shard.spp)
    return Mesh(dev, ("tile", "spp"))


def auto_shard(n_devices: Optional[int] = None) -> ShardConfig:
    """Prefer tile sharding (better VMEM locality), spp for the remainder
    power of two."""
    n = len(jax.devices()) if n_devices is None else n_devices
    tile = 1
    while tile * 2 <= n and tile < 8:
        tile *= 2
    return ShardConfig(tile=tile, spp=n // tile)


def render_sharded(scene: Scene, params, cfg: RenderConfig, corners,
                   mesh: Mesh, spp: int, direct_light: bool = False,
                   impl: str = "oracle",
                   interpret: bool = False):
    """Full sharded render: returns the (H, W, 3) mean image, row-sharded
    over the 'tile' axis (use `gather_image` to materialize on host 0).

    Each chip renders `spp / mesh['spp']` full samples of its
    `height / mesh['tile']` pixel rows, then the spp axis psum-merges.

    `impl="fused"` runs the Pallas megakernel per chip (the production
    multi-chip path: in-kernel path regeneration over the chip's local
    sample slice, ONE launch per chip); `"oracle"` is the pure-jnp
    reference.  `interpret=True` runs the fused kernel on the Pallas
    interpreter (CPU mesh tests).
    """
    fn = _render_sharded_fn(scene, cfg, mesh, spp, direct_light, impl,
                            interpret)
    img = fn(params, corners)
    # non-divisible heights render rows_per = ceil(H / n_tile) rows per
    # chip (the fused kernel pads the same way); crop the padding here
    return img if img.shape[0] == cfg.height else img[:cfg.height]


@functools.lru_cache(maxsize=64)
def _render_sharded_fn(scene: Scene, cfg: RenderConfig, mesh: Mesh,
                       spp: int, direct_light: bool, impl: str,
                       interpret: bool):
    """Build (and cache) the jitted sharded render for a static config.

    Caching matters: `jax.jit` keys on function identity, so a fresh
    closure per call would recompile every step — the progressive driver
    and the train loop call this once per launch."""
    n_tile = mesh.shape["tile"]
    n_spp = mesh.shape["spp"]
    # pad instead of erroring (round-4 verdict): rows round UP to the tile
    # axis (the caller crops) and the spp remainder renders as one extra
    # masked sample on chips si < spp_rem — the sample SET is exactly
    # {0..spp-1}, so a 720-row frame / odd spp on an 8-chip mesh is legal
    rows_per = -(-cfg.height // n_tile)
    spp_per = spp // n_spp
    spp_rem = spp % n_spp

    def shard_fn(params, corners):
        ti = lax.axis_index("tile")
        si = lax.axis_index("spp")
        row0 = (ti * rows_per).astype(jnp.int32)
        origin = jnp.stack([jnp.int32(0), row0])
        acc = jnp.zeros((rows_per, cfg.width, 3), jnp.float32)

        if impl == "fused":
            from raymarchrenderer_tpu.kernels.march import render_fused_patch
            s0 = (si * spp_per).astype(jnp.uint32)
            # normalize=False: the kernel emits the raw per-pixel sum so the
            # one division below is the ONLY rounding — bitwise-equal to the
            # unsharded oracle sum (mean→×spp_per would round twice)
            if spp_per:
                acc = render_fused_patch(
                    scene, params, cfg, corners, origin,
                    (rows_per, cfg.width), s0, n_samples=spp_per,
                    direct_light=direct_light, interpret=interpret,
                    normalize=False)
            if spp_rem:
                s = (n_spp * spp_per + si).astype(jnp.uint32)
                extra = render_fused_patch(
                    scene, params, cfg, corners, origin,
                    (rows_per, cfg.width), s, n_samples=1,
                    direct_light=direct_light, interpret=interpret,
                    normalize=False)
                acc = acc + extra * (si < spp_rem).astype(jnp.float32)
        else:
            def body(k, acc):
                s = (si * spp_per + k).astype(jnp.uint32)
                color = render_patch(scene, params, cfg, corners, origin,
                                     (rows_per, cfg.width), s, direct_light)
                return acc + color.stack(-1)

            acc = lax.fori_loop(0, spp_per, body, acc)
            if spp_rem:
                s = (n_spp * spp_per + si).astype(jnp.uint32)
                color = render_patch(scene, params, cfg, corners, origin,
                                     (rows_per, cfg.width), s, direct_light)
                acc = acc + (color.stack(-1)
                             * (si < spp_rem).astype(jnp.float32))
        acc = lax.psum(acc, "spp")
        return acc / jnp.float32(spp)

    # check_vma=False: the carry masks of the march while_loop start as
    # replicated constants and become device-varying — semantically fine
    # (each chip runs an independent march), but the varying-axis type
    # checker would demand explicit pvary plumbing through shared code.
    return jax.jit(
        jax.shard_map(shard_fn, mesh=mesh,
                      in_specs=(P(), P()),
                      out_specs=P("tile", None, None),
                      check_vma=False))


def render_sharded_spectral(scene: Scene, params, mats, cfg: RenderConfig,
                            corners, mesh: Mesh, spp: int,
                            interpret: bool = False):
    """Sharded gen-3 spectral render (the headline-bench transport,
    `RayMarch3.glsl`) over the ('tile', 'spp') mesh: each chip runs the
    spectral megakernel on its pixel-row block × sample slice
    (`render_fused_spectral(origin_xy=..., normalize=False)`), then one
    psum over 'spp' and one division merge like `render_sharded`.

    The sample SET is identical for any mesh shape (RNG on absolute
    (pixel, sample) coords), but unlike the RGB path the per-lane sample
    SUM splits at chip boundaries, so float32 re-association of the
    partial sums is possible in principle — the parity test asserts
    allclose (measured exact on its workload), not array equality."""
    fn = _render_sharded_spectral_fn(scene, cfg, mesh, spp, interpret)
    img = fn(params, mats, corners)
    return img if img.shape[0] == cfg.height else img[:cfg.height]


@functools.lru_cache(maxsize=64)
def _render_sharded_spectral_fn(scene: Scene, cfg: RenderConfig, mesh: Mesh,
                                spp: int, interpret: bool):
    n_tile = mesh.shape["tile"]
    n_spp = mesh.shape["spp"]
    # padded like _render_sharded_fn: ceil rows (caller crops), spp
    # remainder as one extra masked sample on chips si < spp_rem
    rows_per = -(-cfg.height // n_tile)
    spp_per = spp // n_spp
    spp_rem = spp % n_spp

    def shard_fn(params, mats, corners):
        from raymarchrenderer_tpu.kernels.march import render_fused_spectral
        ti = lax.axis_index("tile")
        si = lax.axis_index("spp")
        origin = jnp.stack([jnp.int32(0), (ti * rows_per).astype(jnp.int32)])
        s0 = (si * spp_per).astype(jnp.uint32)
        acc = jnp.zeros((rows_per, cfg.width, 3), jnp.float32)
        if spp_per:
            acc = render_fused_spectral(
                scene, params, mats, cfg, corners, s0, n_samples=spp_per,
                interpret=interpret, origin_xy=origin,
                patch_shape=(rows_per, cfg.width), normalize=False)
        if spp_rem:
            s = (n_spp * spp_per + si).astype(jnp.uint32)
            extra = render_fused_spectral(
                scene, params, mats, cfg, corners, s, n_samples=1,
                interpret=interpret, origin_xy=origin,
                patch_shape=(rows_per, cfg.width), normalize=False)
            acc = acc + extra * (si < spp_rem).astype(jnp.float32)
        return lax.psum(acc, "spp") / jnp.float32(spp)

    return jax.jit(
        jax.shard_map(shard_fn, mesh=mesh,
                      in_specs=(P(), P(), P()),
                      out_specs=P("tile", None, None),
                      check_vma=False))


def train_step_sharded(scene: Scene, params, cfg: RenderConfig, corners,
                       target, mesh: Mesh, spp: int, lr: float = 1e-2,
                       direct_light: bool = False,
                       march_impl: str = "oracle",
                       interpret: bool = False,
                       remat: bool = True):
    """One inverse-rendering SGD step over the ('tile', 'spp') mesh.

    The distributed-training analogue for this framework (BASELINE config 5):
    forward render sharded over tiles and samples, pixel L2 loss against
    `target`, reparameterized-march gradients to every scene parameter,
    grad all-reduce (`psum` over both mesh axes — rides ICI), SGD update.
    Returns (scalar loss, updated params), both replicated.

    `march_impl="fused"` runs every forward march on the Pallas kernel
    (`diff.march.march_diff_fused`) — the production differentiable path:
    the march (the cost center of both passes) runs at kernel rates and the
    backward is the implicit adjoint in plain XLA.  The chip's whole sample
    slice renders as ONE batched trace (`render_patch_spp`: sample axis
    folded into rows — one march launch per bounce, not per
    (sample, bounce)).  `remat=True` (default) wraps the render in
    `jax.checkpoint` with `diff.march.march_save_policy()`: only the
    (t, mid, hit) march planes are stored, the backward replay recomputes
    the cheap shading chain and DCEs the march entirely — the cost center
    runs ONCE per step, and residual memory is 3 small planes per bounce
    instead of the full shade chain, which is what lets a full-frame
    1024²+ train step fit HBM (BASELINE config 5)."""
    fn = _train_step_fn(scene, cfg, mesh, spp, direct_light, march_impl,
                        interpret, remat)
    return fn(params, corners, target, jnp.float32(lr))


@functools.lru_cache(maxsize=64)
def _train_step_fn(scene: Scene, cfg: RenderConfig, mesh: Mesh, spp: int,
                   direct_light: bool, march_impl: str, interpret: bool,
                   remat: bool):
    """Build (and cache) the jitted sharded train step.  Caching matters:
    `jax.jit` keys on function identity, so a fresh closure per call
    recompiles every step (~200× the step itself).  The learning rate is a
    traced argument of the returned function, so one compilation serves a
    whole schedule; everything structural is in the cache key."""
    n_tile = mesh.shape["tile"]
    n_spp = mesh.shape["spp"]
    if cfg.height % n_tile or spp % n_spp:
        raise ValueError("height/spp must divide the mesh axes")
    rows_per = cfg.height // n_tile
    spp_per = spp // n_spp
    norm = jnp.float32(cfg.height * cfg.width * 3)

    def shard_fn(params, corners, target, lr):
        ti = lax.axis_index("tile")
        si = lax.axis_index("spp")
        origin = jnp.stack([jnp.int32(0), (ti * rows_per).astype(jnp.int32)])

        def local_render(params, s0):
            color = render_patch_spp(scene, params, cfg, corners, origin,
                                     (rows_per, cfg.width), s0, spp_per,
                                     direct_light, differentiable=True,
                                     march_impl=march_impl,
                                     interpret=interpret)
            return color.stack(-1)

        if remat:
            from raymarchrenderer_tpu.diff.march import march_save_policy
            local_render = jax.checkpoint(local_render,
                                          policy=march_save_policy())

        def loss_fn(params):
            s0 = (si * spp_per).astype(jnp.uint32)
            acc = local_render(params, s0)
            img = lax.psum(acc, "spp") / jnp.float32(spp)
            local = jnp.sum((img - target) ** 2)
            # identical loss on every spp member; psum over tiles gives the
            # global loss (divide by n_spp to undo the replication)
            return lax.psum(local, "tile") / norm

        # Per-device grads are disjoint contributions (each device's compute
        # path covers its own rows × its own samples), so the true global
        # gradient is one psum over BOTH mesh axes — the overlapped grad
        # all-reduce of the north star.
        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = lax.psum(grads, ("tile", "spp"))
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return loss, new_params

    return jax.jit(
        jax.shard_map(shard_fn, mesh=mesh,
                      in_specs=(P(), P(), P("tile", None, None), P()),
                      out_specs=(P(), P()),
                      check_vma=False))


def train_step_spectral_sharded(scene: Scene, params, mats, cfg,
                                corners, target, mesh: Mesh, spp: int,
                                lr: float = 1e-2,
                                lr_bands_nm: float = 3.0,
                                march_impl: str = "oracle",
                                soft_edge: float = 8.0,
                                interpret: bool = False,
                                sample0=0):
    """One spectral inverse-rendering SGD step (round-4 `train --spectral`).

    Same mesh layout as `train_step_sharded`, but the forward is the
    differentiable gen-3 wavelength transport
    (`spectral_integrator.render_patch_spp_spectral(differentiable=True)`:
    reparameterized marches + smooth-boxcar band filters), and the fit
    variables include the BAND TABLE — min/max wavelength and power per
    material row (`kind` stays static) — alongside the scene params.

    Band rows update by SIGN (`lr_bands_nm` nanometres per step, Rprop
    family) rather than raw SGD: d(loss)/d(edge) spans orders of
    magnitude across steps (the soft boxcar multiplies into every
    interaction's power), and a single outlier gradient at a plain lr
    was measured to catapult the edges out of the visible range.  The
    bands are also clamped to [380, 830] nm (max ≥ min + 5) inside the
    graph, so even a wild step renders sanely and the clamp's zero
    gradient pulls nothing further out.  Returns
    (loss, new_params, new_mats)."""
    fn = _train_step_spectral_fn(scene, cfg, mesh, spp, march_impl,
                                 float(soft_edge), interpret)
    bands = (mats.min_wave, mats.max_wave, mats.power)
    loss, new_params, new_bands = fn(params, bands, mats.kind, corners,
                                     target, jnp.float32(lr),
                                     jnp.float32(lr_bands_nm),
                                     jnp.uint32(sample0))
    from raymarchrenderer_tpu.render.spectral_integrator import (
        SpectralMaterials)
    return loss, new_params, SpectralMaterials(
        new_bands[0], new_bands[1], new_bands[2], mats.kind)


def _clamp_bands(minw, maxw, power):
    minw = jnp.clip(minw, 380.0, 825.0)
    maxw = jnp.clip(maxw, minw + 5.0, 830.0)
    return minw, maxw, jnp.clip(power, 1e-4, None)


@functools.lru_cache(maxsize=64)
def _train_step_spectral_fn(scene: Scene, cfg: RenderConfig, mesh: Mesh,
                            spp: int, march_impl: str, soft_edge: float,
                            interpret: bool):
    from raymarchrenderer_tpu.render.spectral_integrator import (
        SpectralMaterials, render_patch_spp_spectral)

    n_tile = mesh.shape["tile"]
    n_spp = mesh.shape["spp"]
    if cfg.height % n_tile or spp % n_spp:
        raise ValueError("height/spp must divide the mesh axes")
    rows_per = cfg.height // n_tile
    spp_per = spp // n_spp
    norm = jnp.float32(cfg.height * cfg.width * 3)

    def shard_fn(params, bands, kind, corners, target, lr, lr_bands,
                 sample0):
        ti = lax.axis_index("tile")
        si = lax.axis_index("spp")
        origin = jnp.stack([jnp.int32(0), (ti * rows_per).astype(jnp.int32)])

        def loss_fn(fit):
            params_f, bands_f = fit
            minw, maxw, power = _clamp_bands(*bands_f)
            mats = SpectralMaterials(minw, maxw, power, kind)
            # fresh Monte-Carlo batch per step (pass sample0 = k·spp):
            # re-using one batch every step fits ITS noise, not the scene
            s0 = sample0 + (si * spp_per).astype(jnp.uint32)
            acc = render_patch_spp_spectral(
                scene, params_f, mats, cfg, corners, origin,
                (rows_per, cfg.width), s0, spp_per, differentiable=True,
                march_impl=march_impl, soft_edge=soft_edge,
                interpret=interpret)
            img = lax.psum(acc.stack(-1), "spp") / jnp.float32(spp)
            local = jnp.sum((img - target) ** 2)
            return lax.psum(local, "tile") / norm

        loss, grads = jax.value_and_grad(loss_fn)((params, bands))
        grads = lax.psum(grads, ("tile", "spp"))
        gp, (g_min, g_max, g_pow) = grads
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, gp)
        # sign update for the nm-scaled rows, smaller sign step for the
        # unitless power; zero gradient moves nothing (sign(0) == 0)
        new_bands = _clamp_bands(
            bands[0] - lr_bands * jnp.sign(g_min),
            bands[1] - lr_bands * jnp.sign(g_max),
            bands[2] - 0.01 * lr_bands * jnp.sign(g_pow))
        return loss, new_params, new_bands

    return jax.jit(
        jax.shard_map(shard_fn, mesh=mesh,
                      in_specs=(P(), P(), P(), P(), P("tile", None, None),
                                P(), P(), P()),
                      out_specs=(P(), P(), P()),
                      check_vma=False))


def train_loss_sharded(scene: Scene, params, cfg: RenderConfig, corners,
                       target, mesh: Mesh, spp: int,
                       direct_light: bool = False,
                       march_impl: str = "oracle",
                       interpret: bool = False):
    """The FORWARD half of `train_step_sharded` alone (sharded render +
    loss, no grad/update) — the denominator for an honest
    backward-overhead ratio: it runs the identical differentiable-mode
    trace the train step differentiates, not the (faster) megakernel."""
    fn = _train_loss_fn(scene, cfg, mesh, spp, direct_light, march_impl,
                        interpret)
    return fn(params, corners, target)


@functools.lru_cache(maxsize=64)
def _train_loss_fn(scene: Scene, cfg: RenderConfig, mesh: Mesh, spp: int,
                   direct_light: bool, march_impl: str, interpret: bool):
    n_tile = mesh.shape["tile"]
    n_spp = mesh.shape["spp"]
    if cfg.height % n_tile or spp % n_spp:
        raise ValueError("height/spp must divide the mesh axes")
    rows_per = cfg.height // n_tile
    spp_per = spp // n_spp
    norm = jnp.float32(cfg.height * cfg.width * 3)

    def shard_fn(params, corners, target):
        ti = lax.axis_index("tile")
        si = lax.axis_index("spp")
        origin = jnp.stack([jnp.int32(0), (ti * rows_per).astype(jnp.int32)])
        s0 = (si * spp_per).astype(jnp.uint32)
        color = render_patch_spp(scene, params, cfg, corners, origin,
                                 (rows_per, cfg.width), s0, spp_per,
                                 direct_light, differentiable=True,
                                 march_impl=march_impl, interpret=interpret)
        acc = color.stack(-1)
        img = lax.psum(acc, "spp") / jnp.float32(spp)
        local = jnp.sum((img - target) ** 2)
        return lax.psum(local, "tile") / norm

    return jax.jit(
        jax.shard_map(shard_fn, mesh=mesh,
                      in_specs=(P(), P(), P("tile", None, None)),
                      out_specs=P(),
                      check_vma=False))


def gather_image(img) -> np.ndarray:
    """Materialize a (possibly sharded) device image on the host —
    the `glReadPixels` analogue (`Graphics.cpp:759`); across processes use
    `multihost.gather_to_host0`."""
    return np.asarray(jax.device_get(img))


def render_replicated_params(scene: Scene, params, mesh: Mesh):
    """Place params replicated on every chip of the mesh (uniform upload
    analogue, `Graphics.cpp:316-348`)."""
    spec = NamedSharding(mesh, P())
    return jax.device_put(params, spec)
