"""Fused Pallas TPU kernel: raygen + march + shade + accumulate in one pass.

The TPU-native replacement for the reference's GLSL compute dispatch
(`Graphics::Render` → `glDispatchCompute` → `RayMarch3.glsl:524-555`):
one `pallas_call` renders the whole frame, gridded over (BH, BW) pixel
tiles (VPU-aligned: BW = 128 lanes).  Inside each program:

  * pixel coords from `program_id` + `broadcasted_iota` (the
    `gl_GlobalInvocationID` analogue),
  * the SAME pure-jnp scene composition, integrator and counter-based RNG
    as the oracle (`render.integrator.trace_rgb`) traced over the tile —
    one source of truth, bitwise-matching random streams,
  * per-tile early-out: each program runs its own masked march
    `while_loop`, so a tile whose rays all converge stops marching — the
    block-level divergence win of the reference's 16×16 workgroups
    (`RayMarch3.glsl:14`), impossible for a whole-image XLA while_loop
    which steps until the LAST pixel of the frame converges,
  * an in-kernel spp loop (`n_samples`): samples accumulate in registers /
    VMEM and HBM sees ONE write per tile per launch instead of one per
    sample — the progressive loop's HBM traffic drops by n_samples×.

Scene parameters arrive as flattened pytree leaves (reshaped 2-D for TPU
ref layout) and are rebuilt inside the kernel, so ANY data-driven scene
graph compiles into the kernel with zero string codegen — the trace-time
equivalent of the reference's `//#…INSERT` GLSL splicing
(`Graphics.cpp:64-113`).

Env-map scenes run the wavefront mode with a *deferred sky*: arbitrary
2-D gathers are VPU-hostile, so the kernel records each path's (at most
one) miss event — throughput and direction — in six extra output planes,
and the equirect lookup (`RayMarch.glsl:78-113` semantics) composites
outside in plain XLA: color + miss_thr · sky(miss_dir).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raymarchrenderer_tpu.core.rng import RNGStream
from raymarchrenderer_tpu.core.vecmath import Vec3
from raymarchrenderer_tpu.render.config import RenderConfig
from raymarchrenderer_tpu.render.integrator import trace_rgb
from raymarchrenderer_tpu.render.mega import trace_mega_paths
from raymarchrenderer_tpu.render.raygen import primary_rays
from raymarchrenderer_tpu.scene.graph import Scene

# VPU-aligned tile: lanes are always 128.  (32, 128) = 4096 lanes is the
# measured sweet spot on TPU v5e: large enough to amortize Mosaic control
# overhead, small enough that VMEM holds the megakernel carries and
# straggler lanes don't dominate.  Swept on-chip; see bench.py.
DEFAULT_BH = 32
DEFAULT_BW = 128
# Shade-pass cadence and march-chunk unroll (render.mega.trace_mega):
# measured optima on v5e at the 1024^2/512/16 default workload with the
# relaxed march (bench.py): gate 0 = one unconditional masked pass per
# 32-step chunk — with short relaxed segments the two global reductions +
# cond of the adaptive gate cost more than they save.
DEFAULT_SHADE_GATE = 0.0
DEFAULT_MARCH_UNROLL = 32
# Round-4 issue-roofline knobs for the megakernels (see
# render.mega.trace_mega_spectral / trace_mega_paths): lazy_miss moves
# the per-step miss test to pass boundaries (254 -> 290 Mpix*spp/s on the
# spectral headline alone); regen_cadence adds a cheap retire pass every
# k steps (-> 299 combined).  Swept on-chip round 4 (docs/performance.md;
# tools/headline_sweep.py): unroll 32 / cadence 16 is the measured
# optimum, and both knobs measured BITWISE on the headline scene (lazy
# miss diverges only for rays grazing geometry at the max_dist shell /
# step budget — the relax_omega trade class).  Keep unroll a multiple of
# the cadence and a divisor of max_steps (misalignment reintroduces the
# budget-overshoot divergence: measured 3e-2 on ~2e-6 of pixels at
# unroll 40/cad 20).
DEFAULT_LAZY_MISS = True
DEFAULT_REGEN_CADENCE = 16


def _tile_kernel(scene: Scene, cfg: RenderConfig, treedef, leaf_shapes,
                 n_samples: int, direct_light: bool, bh: int, bw: int,
                 mode: str = "wavefront",
                 shade_gate: float = DEFAULT_SHADE_GATE,
                 march_unroll: int = DEFAULT_MARCH_UNROLL,
                 defer_sky: bool = False, normalize: bool = True,
                 lazy_miss: bool = False, regen_cadence: int = 0):
    """Build the kernel body (closed over the static scene/config)."""

    def kernel(corners_ref, scalar_ref, *refs):
        n_shipped = sum(1 for _, size in leaf_shapes if size)
        param_refs = refs[:n_shipped]
        if defer_sky and mode == "mega":
            # banks: throughput (3 f32) + packed (u, v) (1 i32) per slot
            (out_r, out_g, out_b, mt_r, mt_g, mt_b,
             uv_ref) = refs[n_shipped:]
        elif defer_sky:
            (out_r, out_g, out_b, mt_r, mt_g, mt_b,
             md_x, md_y, md_z) = refs[n_shipped:]  # banks: (K, bh, bw)
        else:
            out_r, out_g, out_b = refs[n_shipped:]

        i = pl.program_id(0)
        j = pl.program_id(1)
        oy = scalar_ref[0, 1].astype(jnp.int32)
        ox = scalar_ref[0, 2].astype(jnp.int32)
        py = (oy + i * bh
              + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0))
        px = (ox + j * bw
              + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1))

        leaves = []
        ri = 0
        for shp, size in leaf_shapes:
            if size == 0:  # empty leaf (e.g. zero lights): not shipped
                leaves.append(jnp.zeros(shp, jnp.float32))
            else:
                leaves.append(param_refs[ri][:].reshape(shp))
                ri += 1
        params = jax.tree.unflatten(treedef, leaves)
        corners = tuple(corners_ref[k, :] for k in range(5))
        e = corners[0]
        eye = Vec3(jnp.full((bh, bw), e[0], jnp.float32),
                   jnp.full((bh, bw), e[1], jnp.float32),
                   jnp.full((bh, bw), e[2], jnp.float32))
        channels = Vec3.full((bh, bw), 1.0, 1.0, 1.0)
        s0 = scalar_ref[0, 0].astype(jnp.uint32)

        inv = 1.0 / float(n_samples) if normalize else 1.0
        if mode == "mega" and defer_sky:
            # megakernel + deferred sky: misses park as _WAIT_MISS and the
            # regen pass banks each path's (throughput, packed-uv) miss
            # event into its slot (K-deep loop carries); the XLA composite
            # outside does the equirect gather.  `n_samples` here is
            # K_BANK in PATH units (host chunking enforces whole samples),
            # trace_mega_paths wants sample units.  Schedule note: a
            # sample-synchronous variant (1-deep banks stored per sample)
            # was measured SLOWER (18.8 vs 24.7 Mpix·spp/s) — losing the
            # cross-sample regeneration costs more than the K-deep bank
            # carries; either way the env path's wall is the composite's
            # gather (docs/performance.md).
            unit = 3 if cfg.separate_channels else 1
            n_samp = n_samples // unit
            s0_samp = s0 // jnp.uint32(3) if cfg.separate_channels else s0
            c, rec = trace_mega_paths(scene, params, cfg, corners, px, py,
                                      s0_samp, channels, n_samples=n_samp,
                                      shade_gate=shade_gate,
                                      march_unroll=march_unroll,
                                      dispersion=cfg.separate_channels,
                                      direct_light=direct_light,
                                      defer_sky=True,
                                      lazy_miss=lazy_miss,
                                      regen_cadence=regen_cadence)
            # RAW per-pixel sums like the wavefront defer branch — the
            # host divides ONCE after compositing all chunks
            out_r[:] = c.x
            out_g[:] = c.y
            out_b[:] = c.z
            np_ = n_samples  # path count == bank depth
            for k in range(np_):
                mt_r[k] = rec[0 * np_ + k]
                mt_g[k] = rec[1 * np_ + k]
                mt_b[k] = rec[2 * np_ + k]
                uv_ref[k] = rec[3 * np_ + k]
            return
        if mode == "mega":
            # single trace with in-loop sample regeneration: straggler
            # cost amortizes over all n_samples (render.mega); dispersion
            # (`separateChannels`, RayMarch.glsl:580-598) folds the channel
            # into the same regeneration loop — 3 one-hot paths per sample
            c = trace_mega_paths(scene, params, cfg, corners, px, py, s0,
                                 channels, n_samples=n_samples,
                                 shade_gate=shade_gate,
                                 march_unroll=march_unroll,
                                 dispersion=cfg.separate_channels,
                                 direct_light=direct_light,
                                 lazy_miss=lazy_miss,
                                 regen_cadence=regen_cadence)
            out_r[:] = c.x * inv
            out_g[:] = c.y * inv
            out_b[:] = c.z * inv
            return

        if defer_sky:
            # env-map scenes: the VPU-hostile equirect gather stays OUT of
            # the kernel — the kernel BANKS each sample's miss event
            # (path throughput + miss direction, 6 planes per sample slot)
            # and render_fused_patch composites `thr * sky(dir)` in plain
            # XLA after the launch.  n_samples slots per launch amortize
            # the dispatch (the former one-sample-per-launch restriction);
            # `n_valid` masks trailing slots of a partial final chunk so
            # arbitrary spp stay bitwise-equal to the oracle.
            n_valid = scalar_ref[0, 3].astype(jnp.uint32)

            def sample_body(k, acc):
                ku = jnp.asarray(k).astype(jnp.uint32)
                s = s0 + ku
                live = (ku < n_valid).astype(jnp.float32)
                if cfg.separate_channels:
                    # dispersion × env-map: the bank slot counter runs over
                    # (sample, channel) PATHS — 3 per sample, each with its
                    # own miss event.  Channel ci of sample samp shares
                    # samp's primary ray and draws shade stream
                    # samp*4+ci+1, the oracle's exact keying
                    # (`render.integrator.render_patch`,
                    # RayMarch.glsl:580-598 + :78-113 together).
                    samp = s // jnp.uint32(3)
                    ci = s % jnp.uint32(3)
                    s_id = samp * jnp.uint32(4) + ci + jnp.uint32(1)
                    ch = Vec3(
                        jnp.broadcast_to((ci == 0).astype(jnp.float32),
                                         (bh, bw)),
                        jnp.broadcast_to((ci == 1).astype(jnp.float32),
                                         (bh, bw)),
                        jnp.broadcast_to((ci == 2).astype(jnp.float32),
                                         (bh, bw)))
                else:
                    samp, s_id, ch = s, s, channels
                rng = RNGStream(cfg.seed, px, py, samp, jnp.uint32(1 << 20))
                d = primary_rays(corners, px, py, cfg.width, cfg.height,
                                 rng)
                c, mthr, mdir = trace_rgb(scene, params, cfg, eye, d, px,
                                          py, s_id, ch, direct_light,
                                          defer_sky=True)
                mt_r[k] = mthr.x * live
                mt_g[k] = mthr.y * live
                mt_b[k] = mthr.z * live
                md_x[k], md_y[k], md_z[k] = mdir.x, mdir.y, mdir.z
                ar, ag, ab = acc
                return (ar + c.x * live, ag + c.y * live, ab + c.z * live)

            zero = jnp.zeros((bh, bw), jnp.float32)
            acc0 = sample_body(0, (zero, zero, zero))
            ar, ag, ab = jax.lax.fori_loop(1, n_samples, sample_body, acc0)
            out_r[:], out_g[:], out_b[:] = ar, ag, ab
            return

        def body(k, acc):
            s = s0 + jnp.asarray(k).astype(jnp.uint32)
            rng = RNGStream(cfg.seed, px, py, s, jnp.uint32(1 << 20))
            d = primary_rays(corners, px, py, cfg.width, cfg.height, rng)
            if cfg.separate_channels:
                # dispersion: R, G, B traced as independent one-hot paths
                # sharing s's primary ray — same keying as render_patch
                c = Vec3.zeros((bh, bw))
                for ci, mask in enumerate(((1.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                                           (0.0, 0.0, 1.0))):
                    ch = Vec3.full((bh, bw), *mask)
                    s_id = s * jnp.uint32(4) + jnp.uint32(ci + 1)
                    c = c + trace_rgb(scene, params, cfg, eye, d, px, py,
                                      s_id, ch, direct_light)
            else:
                c = trace_rgb(scene, params, cfg, eye, d, px, py, s,
                              channels, direct_light)
            ar, ag, ab = acc
            return (ar + c.x, ag + c.y, ab + c.z)

        # peel sample 0: splat-constant (replicated-layout) initial carries
        # don't relayout in Mosaic — same reason trace_rgb peels bounce 0
        zero = jnp.zeros((bh, bw), jnp.float32)
        acc0 = body(0, (zero, zero, zero))
        ar, ag, ab = jax.lax.fori_loop(1, n_samples, body, acc0)
        out_r[:] = ar * inv
        out_g[:] = ag * inv
        out_b[:] = ab * inv

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("scene", "cfg", "patch_shape", "n_samples",
                     "direct_light", "block", "interpret", "mode",
                     "shade_gate", "march_unroll", "normalize",
                     "lazy_miss", "regen_cadence"))
def render_fused_patch(scene: Scene, params, cfg: RenderConfig, corners,
                       origin_xy, patch_shape, sample0,
                       n_samples: int = 1, direct_light: bool = False,
                       block=(DEFAULT_BH, DEFAULT_BW),
                       interpret: bool = False, mode: str = "auto",
                       shade_gate: float = DEFAULT_SHADE_GATE,
                       march_unroll: int = DEFAULT_MARCH_UNROLL,
                       normalize: bool = True,
                       lazy_miss: bool = DEFAULT_LAZY_MISS,
                       regen_cadence: int = DEFAULT_REGEN_CADENCE):
    """Mean of `n_samples` samples of a (ph, pw) pixel patch at dynamic
    origin `origin_xy` — the fused-kernel twin of
    `render.integrator.render_patch` (unit of tile sharding).  Returns
    (ph, pw, 3) float32 linear.

    `normalize=False` returns the raw per-pixel SUM over samples instead of
    the mean — callers that merge shards (`parallel.sharding`) divide once
    at the end, keeping the sharded result bitwise-equal to the unsharded
    oracle (mean→sum→mean would round twice).

    `interpret=True` runs the Pallas interpreter (CPU test path — the
    "fake backend" of SURVEY.md §4 item 2)."""
    defer_sky = scene.has_env_map
    if mode == "auto":
        # megakernel everywhere: NEE shadow marches run as extra segments
        # of the same in-kernel loop, and env-map miss events bank into
        # per-path slots at the regen pass (defer_sky) for the
        # out-of-kernel equirect composite
        mode = "mega"
    if interpret:
        # unroll/cadence are pure scheduling knobs (bitwise invariant); the
        # Pallas interpreter just pays its trace blow-up, so keep tests
        # fast.  lazy_miss is kept as passed (its divergence class is what
        # the interpreter tests pin down).
        march_unroll = 1
        regen_cadence = 0
    bh, bw = block
    # clamp the block to the patch, then PAD the patch up to a block
    # multiple (instead of shrinking the block to a divisor: the largest
    # divisor of a prime-width frame is 1, a silent thousands-of-programs
    # perf cliff).  Padded lanes render real rays at out-of-frame pixel
    # coords and are cropped after the launch — each pixel is independent
    # and the RNG is keyed on absolute coords, so kept pixels are bitwise
    # invariant to the padding.  Waste is < one block row + column.
    ph, pw = patch_shape
    bh, bw = min(bh, ph), min(bw, pw)
    php = -(-ph // bh) * bh
    pwp = -(-pw // bw) * bw
    block = (bh, bw)

    if defer_sky:
        # the env image never enters the kernel (VPU-hostile gather, and it
        # would bloat VMEM) — ship a placeholder leaf; the real image is
        # gathered in the XLA composite below
        ship_params = dict(params)
        ship_params["env"] = dict(params["env"])
        ship_params["env"]["image"] = jnp.zeros((1, 1, 3), jnp.float32)
    else:
        ship_params = params
    leaves, treedef = jax.tree.flatten(ship_params)
    leaves = [jnp.asarray(l, jnp.float32) for l in leaves]
    leaf_shapes = tuple((jnp.shape(l), int(l.size)) for l in leaves)
    # TPU refs want >=2D: ship each non-empty leaf as (1, size)
    leaves2d = [l.reshape(1, l.size) for l in leaves if l.size]
    corners_arr = jnp.stack([jnp.asarray(c, jnp.float32) for c in corners])

    # miss-event bank depth per launch: enough to amortize dispatch +
    # composite AND keep the megakernel's cross-sample regeneration deep
    # (measured: depth 8/16/32 within 3% — docs/performance.md), small
    # enough that the (K, ph, pw) f32 banks stay bounded in HBM (the mega
    # path's 4 planes at K=32, 1024x1024 ≈ 512 MB transient).  With
    # dispersion each sample is 3 (sample, channel) paths, each with its
    # own bank slot.
    n_paths = n_samples * (3 if cfg.separate_channels else 1)
    unit = 3 if cfg.separate_channels else 1
    if defer_sky and mode == "mega":
        # the megakernel's banks live as loop carries, so every chunk is a
        # WHOLE number of samples (no n_valid tail masking): bulk chunks
        # run at depth 32 paths; a non-multiple spp (e.g. prime) runs ONE
        # extra tail launch with its own smaller bank depth instead of
        # silently degrading every chunk to depth 1
        K_BANK = min(32 // unit, n_samples) * unit
    elif defer_sky:
        K_BANK = min(8, n_paths)
    else:
        K_BANK = n_samples

    grid = (php // bh, pwp // bw)
    small_vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    plane = jax.ShapeDtypeStruct((php, pwp), jnp.float32)

    def make_chunk_fn(K):
        """Build the kernel + launcher + composite for bank depth K."""
        kernel = _tile_kernel(scene, cfg, treedef, leaf_shapes, K,
                              direct_light, bh, bw, mode, shade_gate,
                              march_unroll, defer_sky, normalize,
                              lazy_miss, regen_cadence)
        bank_spec = pl.BlockSpec((K, bh, bw), lambda i, j: (0, i, j),
                                 memory_space=pltpu.VMEM)
        bank = jax.ShapeDtypeStruct((K, php, pwp), jnp.float32)
        ibank = jax.ShapeDtypeStruct((K, php, pwp), jnp.int32)
        if defer_sky and mode == "mega":
            out_specs = (out_spec,) * 3 + (bank_spec,) * 4
            out_shapes = (plane,) * 3 + (bank,) * 3 + (ibank,)
        elif defer_sky:
            out_specs = (out_spec,) * 3 + (bank_spec,) * 6
            out_shapes = (plane,) * 3 + (bank,) * 6
        else:
            out_specs = (out_spec,) * 3
            out_shapes = (plane,) * 3

        def launch(sample, n_valid):
            scalar_arr = jnp.stack([
                jnp.asarray(sample, jnp.uint32).astype(jnp.int32),
                jnp.asarray(origin_xy[1], jnp.int32),
                jnp.asarray(origin_xy[0], jnp.int32),
                jnp.asarray(n_valid, jnp.int32)]).reshape(1, 4)
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[small_vmem,
                          pl.BlockSpec(memory_space=pltpu.SMEM)]
                         + [small_vmem] * len(leaves2d),
                out_specs=out_specs,
                out_shape=out_shapes,
                interpret=interpret,
            )(corners_arr, scalar_arr, *leaves2d)

        if not defer_sky:
            return launch

        def one_chunk(sample, n_valid):
            """One K-deep launch + the XLA sky composite: the banked miss
            throughputs scatter the (bilinear) equirect lookups back onto
            the hit accumulation.  Dead slots carry thr=0.  The mega
            kernel banks packed (u, v) (16+16 bits, computed in-kernel);
            the wavefront banks raw directions and the composite derives
            (u, v) itself."""
            if mode == "mega":
                r, g, b, tr, tg, tb, uvp = launch(sample, n_valid)
                r, g, b = r[:ph, :pw], g[:ph, :pw], b[:ph, :pw]
                tr, tg, tb = (tr[:, :ph, :pw], tg[:, :ph, :pw],
                              tb[:, :ph, :pw])
                uvp = uvp[:, :ph, :pw]
                # +0.5: reconstruct at the quantization-bin center
                u = ((((uvp >> 16) & 0xffff).astype(jnp.float32) + 0.5)
                     / 65536.0)
                v = ((uvp & 0xffff).astype(jnp.float32) + 0.5) / 65536.0
                sky = scene.sky_uv(params, u, v)          # (K, ph, pw)
            else:
                r, g, b, tr, tg, tb, dx, dy, dz = launch(sample, n_valid)
                # crop padding BEFORE the gather — no lookups for dead lanes
                r, g, b = r[:ph, :pw], g[:ph, :pw], b[:ph, :pw]
                tr, tg, tb = (tr[:, :ph, :pw], tg[:, :ph, :pw],
                              tb[:, :ph, :pw])
                dx, dy, dz = (dx[:, :ph, :pw], dy[:, :ph, :pw],
                              dz[:, :ph, :pw])
                sky = scene.sky(params, Vec3(dx, dy, dz))     # (K, ph, pw)
            return jnp.stack([r + (tr * sky.x).sum(0),
                              g + (tg * sky.y).sum(0),
                              b + (tb * sky.z).sum(0)], axis=-1)

        return one_chunk

    if not defer_sky:
        launch = make_chunk_fn(K_BANK)
        r, g, b = launch(sample0, n_samples)
        return jnp.stack([r, g, b], axis=-1)[:ph, :pw]

    one_chunk = make_chunk_fn(K_BANK)

    # the chunk counter runs in PATH units (== samples, or 3x samples when
    # dispersion enumerates (sample, channel) pairs — kernel divides back)
    s0 = jnp.asarray(sample0, jnp.uint32)
    if cfg.separate_channels:
        s0 = s0 * jnp.uint32(3)
    if mode == "mega":
        # whole-sample chunks only: bulk at K_BANK + one tail launch for
        # the remainder (its own compiled kernel at the smaller depth)
        n_full = n_paths // K_BANK
        rem = n_paths - n_full * K_BANK
        if n_full == 1:
            total = one_chunk(s0, K_BANK)
        elif n_full > 1:
            def chunk_body(c, acc):
                cu = jnp.uint32(c)
                return acc + one_chunk(s0 + cu * jnp.uint32(K_BANK),
                                       jnp.int32(K_BANK))
            total = jax.lax.fori_loop(0, n_full, chunk_body,
                                      jnp.zeros((ph, pw, 3), jnp.float32))
        else:
            total = jnp.zeros((ph, pw, 3), jnp.float32)
        if rem:
            tail_chunk = make_chunk_fn(rem)
            total = total + tail_chunk(s0 + jnp.uint32(n_full * K_BANK),
                                       jnp.int32(rem))
        return total / float(n_samples) if normalize else total
    n_chunks = -(-n_paths // K_BANK)
    if n_chunks == 1:
        total = one_chunk(s0, n_paths)
    else:
        def chunk_body(c, acc):
            cu = jnp.uint32(c)
            n_valid = jnp.minimum(
                jnp.int32(K_BANK),
                jnp.int32(n_paths) - c * jnp.int32(K_BANK))
            return acc + one_chunk(s0 + cu * jnp.uint32(K_BANK), n_valid)
        total = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                  jnp.zeros((ph, pw, 3), jnp.float32))
    return total / float(n_samples) if normalize else total


@functools.partial(
    jax.jit,
    static_argnames=("scene", "cfg", "block", "interpret"))
def march_fused(scene: Scene, params, cfg: RenderConfig, o: Vec3, d: Vec3,
                dist_mult, active, block=(DEFAULT_BH, DEFAULT_BW),
                interpret: bool = False, t_max=None):
    """Pallas sphere trace over arbitrary (H, W) ray planes — the fused twin
    of `render.integrator.march` (`RayMarch.glsl:233-257` semantics), ONE
    launch for the whole plane, gridded over VPU tiles with per-tile
    early-out (a tile whose rays all converge stops marching — the
    whole-plane XLA while_loop steps until the LAST ray of the frame
    converges).

    Returns (t, mat_index, hit_mask) with hit_mask int32 0/1 — bitwise
    identical to the oracle march (the kernel body IS the oracle march,
    traced over the tile).  Forward-only: this is the hot half of the
    differentiable render (`diff.march.march_diff_fused` pairs it with the
    implicit-function adjoint, whose backward is ONE extra SDF VJP in plain
    XLA — the march loop itself never needs a transpose).

    `t_max` (optional per-lane f32 plane) caps the marched distance like
    the oracle's `t_max` — the shadow-ray path (`_direct_light`) uses it
    so visibility marches stop AT the light."""
    shape = jnp.shape(o.x)
    if len(shape) != 2:
        raise ValueError(f"march_fused wants (H, W) ray planes, got {shape}")
    h, w = shape
    # clamp the block to the plane, then pad the plane to a block multiple
    # (batched-spp planes fold the sample axis into rows, so h need not be
    # a power of 2; shrinking to a divisor would hit 1-wide tiles on prime
    # dims).  Padded lanes enter with active=0, so the march skips them.
    bh, bw = min(block[0], h), min(block[1], w)
    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw

    # the march only reads the object subtree — don't ship materials/env
    # (the env image especially would blow VMEM for nothing)
    mparams = {"objects": params["objects"]}
    leaves, treedef = jax.tree.flatten(mparams)
    leaves = [jnp.asarray(l, jnp.float32) for l in leaves]
    leaf_shapes = tuple((jnp.shape(l), int(l.size)) for l in leaves)
    leaves2d = [l.reshape(1, l.size) for l in leaves if l.size]
    n_shipped = len(leaves2d)

    has_tmax = t_max is not None
    n_planes = 9 if has_tmax else 8

    def kernel(*refs):
        param_refs = refs[:n_shipped]
        ray_refs = refs[n_shipped:n_shipped + n_planes]
        (ox, oy, oz, dx, dy, dz, dm, act) = ray_refs[:8]
        tm = ray_refs[8][:] if has_tmax else None
        t_out, mid_out, hit_out = refs[n_shipped + n_planes:]
        rebuilt = []
        ri = 0
        for shp, size in leaf_shapes:
            if size == 0:
                rebuilt.append(jnp.zeros(shp, jnp.float32))
            else:
                rebuilt.append(param_refs[ri][:].reshape(shp))
                ri += 1
        p = jax.tree.unflatten(treedef, rebuilt)
        from raymarchrenderer_tpu.render.integrator import march
        t, mid, hitb = march(scene, p, cfg,
                             Vec3(ox[:], oy[:], oz[:]),
                             Vec3(dx[:], dy[:], dz[:]),
                             dm[:], act[:] > 0, t_max=tm)
        t_out[:] = t
        mid_out[:] = mid
        hit_out[:] = hitb.astype(jnp.int32)

    tile = pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    small_vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32
    planes = [jnp.asarray(a, f32) for a in
              (o.x, o.y, o.z, d.x, d.y, d.z)]
    planes.append(jnp.broadcast_to(jnp.asarray(dist_mult, f32), shape))
    planes.append(jnp.broadcast_to(
        jnp.asarray(active).astype(jnp.int32), shape))
    if has_tmax:
        planes.append(jnp.broadcast_to(jnp.asarray(t_max, f32), shape))
    if (hp, wp) != (h, w):
        # inactive padding: a zero `active` plane short-circuits the march
        planes = [jnp.pad(a, ((0, hp - h), (0, wp - w))) for a in planes]
    t, mid, hit = pl.pallas_call(
        kernel,
        grid=(hp // bh, wp // bw),
        in_specs=[small_vmem] * n_shipped + [tile] * n_planes,
        out_specs=(tile, tile, tile),
        out_shape=(jax.ShapeDtypeStruct((hp, wp), f32),
                   jax.ShapeDtypeStruct((hp, wp), jnp.int32),
                   jax.ShapeDtypeStruct((hp, wp), jnp.int32)),
        interpret=interpret,
    )(*leaves2d, *planes)
    return t[:h, :w], mid[:h, :w], hit[:h, :w] > 0


def render_fused(scene: Scene, params, cfg: RenderConfig, corners,
                 sample0, n_samples: int = 1, direct_light: bool = False,
                 block=(DEFAULT_BH, DEFAULT_BW), interpret: bool = False,
                 mode: str = "auto", shade_gate: float = DEFAULT_SHADE_GATE,
                 march_unroll: int = DEFAULT_MARCH_UNROLL,
                 lazy_miss: bool = DEFAULT_LAZY_MISS,
                 regen_cadence: int = DEFAULT_REGEN_CADENCE):
    """Full-frame fused render (patch at origin (0,0))."""
    return render_fused_patch(
        scene, params, cfg, corners, (0, 0), (cfg.height, cfg.width),
        sample0, n_samples=n_samples, direct_light=direct_light,
        block=block, interpret=interpret, mode=mode, shade_gate=shade_gate,
        march_unroll=march_unroll, lazy_miss=lazy_miss,
        regen_cadence=regen_cadence)


def render_sample_fused(scene: Scene, params, cfg: RenderConfig, corners,
                        sample, direct_light: bool = False,
                        interpret: bool = False):
    """One full-frame sample — drop-in for `render.integrator.render_sample`
    (returns the stacked (H, W, 3) array)."""
    return render_fused(scene, params, cfg, corners, sample, n_samples=1,
                        direct_light=direct_light, interpret=interpret)


def render_progressive_fused(scene: Scene, params, cfg: RenderConfig,
                             corners, spp: int = None,
                             samples_per_launch: int = 8,
                             direct_light: bool = False,
                             accum=None, n0: float = 0.0,
                             interpret: bool = False):
    """Progressive render driven by the fused kernel: `spp` total samples in
    chunks of `samples_per_launch` (each chunk is ONE kernel launch whose
    samples accumulate on-chip).  Resumable like `render.integrator.render`.
    Returns (image (H, W, 3), n_samples)."""
    spp = cfg.spp if spp is None else spp
    if accum is None:
        accum = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    n = float(n0)
    s = int(n0)
    while s < int(n0) + spp:
        k = min(samples_per_launch, int(n0) + spp - s)
        chunk = render_fused(scene, params, cfg, corners, jnp.uint32(s),
                             n_samples=k, direct_light=direct_light,
                             interpret=interpret)
        # running mean: new_mean = (accum*n + chunk*k) / (n+k)
        accum = (accum * n + chunk * k) / (n + k)
        n += k
        s += k
    return accum, n


def render_progressive_fused_spectral(scene: Scene, params, mats,
                                      cfg: RenderConfig, corners,
                                      spp: int = None,
                                      samples_per_launch: int = 8,
                                      accum=None, n0: float = 0.0,
                                      interpret: bool = False,
                                      callback=None):
    """Progressive gen-3 spectral render via the fused megakernel —
    resumable like `render_progressive_fused`.  Returns (image, n)."""
    import jax.numpy as _jnp
    spp = cfg.spp if spp is None else spp
    if accum is None:
        accum = _jnp.zeros((cfg.height, cfg.width, 3), _jnp.float32)
    n = float(n0)
    s = int(n0)
    while s < int(n0) + spp:
        k = min(samples_per_launch, int(n0) + spp - s)
        chunk = render_fused_spectral(scene, params, mats, cfg, corners,
                                      _jnp.uint32(s), n_samples=k,
                                      interpret=interpret)
        accum = (accum * n + chunk * k) / (n + k)
        n += k
        s += k
        if callback is not None:
            callback(s, (accum, n))
    return accum, n


def render_fused_spectral(scene: Scene, params, mats, cfg: RenderConfig,
                          corners, sample0, n_samples: int = 1,
                          block=(DEFAULT_BH, DEFAULT_BW),
                          interpret: bool = False, mode: str = "mega",
                          shade_gate: float = DEFAULT_SHADE_GATE,
                          march_unroll: int = DEFAULT_MARCH_UNROLL,
                          origin_xy=(0, 0), patch_shape=None,
                          normalize: bool = True,
                          lazy_miss: bool = DEFAULT_LAZY_MISS,
                          regen_cadence: int = DEFAULT_REGEN_CADENCE):
    """Fused gen-3 spectral render (`RayMarch3.glsl` wavelength transport)
    as ONE Pallas launch: the whole spectral integrator — band filters via
    a Mosaic-safe select chain, wavelength→RGB splat — runs per tile.
    `mode="mega"` (default) uses the spectral megakernel
    (`render.mega.trace_mega_spectral`: per-lane bounces + in-loop sample
    regeneration); `mode="wavefront"` loops `trace_spectral` over samples.
    Returns the (H, W, 3) mean (or the raw sum with `normalize=False` —
    the exact-merge contract of `render_fused_patch`).  `origin_xy` +
    `patch_shape` render a sub-rectangle at a dynamic origin (the tile-
    sharding unit; RNG on absolute coords keeps any decomposition bitwise).
    Parity vs `render_sample_spectral` tested via `interpret=True`."""
    from raymarchrenderer_tpu.core.spectral import wavelength_to_rgb
    from raymarchrenderer_tpu.render.mega import trace_mega_spectral
    from raymarchrenderer_tpu.render.spectral_integrator import trace_spectral

    if interpret:
        # pure scheduling knobs; keep interpreter traces fast (cadence
        # parity is covered by direct trace_mega_spectral tests)
        march_unroll = 1
        regen_cadence = 0

    bh, bw = block
    ph, pw = patch_shape if patch_shape is not None else (cfg.height,
                                                          cfg.width)
    bh, bw = min(bh, ph), min(bw, pw)
    # pad to a block multiple and crop after — same contract as
    # render_fused_patch (kept pixels bitwise invariant to padding)
    php = -(-ph // bh) * bh
    pwp = -(-pw // bw) * bw

    combined = {"scene": params, "mats": mats}
    leaves, treedef = jax.tree.flatten(combined)
    leaves = [jnp.asarray(l) for l in leaves]
    leaf_meta = tuple((jnp.shape(l), int(l.size), l.dtype) for l in leaves)
    leaves2d = [l.reshape(1, l.size) for l in leaves if l.size]
    corners_arr = jnp.stack([jnp.asarray(c, jnp.float32) for c in corners])
    scalar_arr = jnp.stack([
        jnp.asarray(sample0, jnp.uint32).astype(jnp.int32),
        jnp.asarray(origin_xy[1], jnp.int32),
        jnp.asarray(origin_xy[0], jnp.int32)]).reshape(1, 3)

    def kernel(corners_ref, scalar_ref, *refs):
        n_shipped = sum(1 for _, size, _ in leaf_meta if size)
        param_refs = refs[:n_shipped]
        out_r, out_g, out_b = refs[n_shipped:]
        i = pl.program_id(0)
        j = pl.program_id(1)
        oy = scalar_ref[0, 1].astype(jnp.int32)
        ox = scalar_ref[0, 2].astype(jnp.int32)
        py = (oy + i * bh
              + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0))
        px = (ox + j * bw
              + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1))
        rebuilt = []
        ri = 0
        for shp, size, dt in leaf_meta:
            if size == 0:
                rebuilt.append(jnp.zeros(shp, dt))
            else:
                rebuilt.append(param_refs[ri][:].reshape(shp))
                ri += 1
        tree = jax.tree.unflatten(treedef, rebuilt)
        p, m = tree["scene"], tree["mats"]
        corners_t = tuple(corners_ref[k, :] for k in range(5))
        e = corners_t[0]
        eye = Vec3(jnp.full((bh, bw), e[0], jnp.float32),
                   jnp.full((bh, bw), e[1], jnp.float32),
                   jnp.full((bh, bw), e[2], jnp.float32))
        s0 = scalar_ref[0, 0].astype(jnp.uint32)

        inv = 1.0 / float(n_samples) if normalize else 1.0
        if mode == "mega":
            c = trace_mega_spectral(scene, p, m, cfg, corners_t, px, py,
                                    s0, n_samples=n_samples,
                                    shade_gate=shade_gate,
                                    march_unroll=march_unroll,
                                    lazy_miss=lazy_miss,
                                    regen_cadence=regen_cadence)
            out_r[:] = c.x * inv
            out_g[:] = c.y * inv
            out_b[:] = c.z * inv
            return

        def body(k, acc):
            s = s0 + jnp.asarray(k).astype(jnp.uint32)
            rng = RNGStream(cfg.seed, px, py, s, jnp.uint32(1 << 20))
            d = primary_rays(corners_t, px, py, cfg.width, cfg.height, rng)
            wl, power = trace_spectral(scene, p, m, cfg, eye, d, px, py, s)
            c = wavelength_to_rgb(wl) * power
            ar, ag, ab = acc
            return (ar + c.x, ag + c.y, ab + c.z)

        zero = jnp.zeros((bh, bw), jnp.float32)
        acc0 = body(0, (zero, zero, zero))
        ar, ag, ab = jax.lax.fori_loop(1, n_samples, body, acc0)
        out_r[:] = ar * inv
        out_g[:] = ag * inv
        out_b[:] = ab * inv

    grid = (php // bh, pwp // bw)
    small_vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    plane = jax.ShapeDtypeStruct((php, pwp), jnp.float32)
    r, g, b = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[small_vmem, pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [small_vmem] * len(leaves2d),
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(plane, plane, plane),
        interpret=interpret,
        # RMR_PALLAS_DEBUG=1 prints the kernel jaxpr + Mosaic module at
        # lowering (tools/mosaic_issue_count.py captures it for the
        # issue-roofline artifact)
        debug=os.environ.get("RMR_PALLAS_DEBUG", "0") == "1",
    )(corners_arr, scalar_arr, *leaves2d)
    return jnp.stack([r, g, b], axis=-1)[:ph, :pw]
