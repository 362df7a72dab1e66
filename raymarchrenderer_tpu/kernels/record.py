"""Recording trace kernel: the megakernel-rate differentiable forward.

The round-2 train step ran the differentiable forward as a
bounce-synchronous wavefront: one Pallas march launch per bounce with the
full-plane XLA shading chain (normals, material graphs, NEE) between
launches.  `tools/diff_profile.py` measured that chain — not the march —
as the residual cost: every bounce pays a full HBM round-trip of the whole
sample-folded plane through a dozen elementwise XLA kernels.

This module moves the ENTIRE forward trace into ONE Pallas launch — the
same in-kernel bounce loop as the production render kernel
(`RayMarch3.glsl:356` semantics, per-tile early-out marches) — and has it
export exactly the planes the differentiable replay needs, which are
exactly the residuals `diff.march.march_save_policy()` already saves:

    t[b], mat_id[b], hit[b]          per bounce        ("march_t" ...)
    shadow_t[b, li]                  per bounce, light ("shadow_t")

The XLA side (`render.integrator.trace_rgb(march_impl="recorded")`) then
replays the cheap shade chain over the recorded geometry, attaching
gradients with the SAME reparameterized / implicit-function adjoint as the
per-bounce path (`diff.march.reparam_t`) — so the march (the cost center
of both passes, `RayMarch3.glsl:145-169`) runs once, in the kernel, at
kernel rates, and reverse-mode never sees a while_loop.

Parity note: the in-kernel shade chain is the same traced code as the XLA
replay, but Mosaic and XLA may contract FMAs differently, so recorded
bounce-(b>0) geometry can differ from the per-bounce-launch path at ulp
level on lanes whose shade math contracts; gradients agree to float32
tolerance (tested), bitwise on scenes where no contraction divergence
occurs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raymarchrenderer_tpu.core.rng import RNGStream
from raymarchrenderer_tpu.core.sampling import uniform_sphere
from raymarchrenderer_tpu.core.vecmath import Vec3, vselect
from raymarchrenderer_tpu.kernels.march import (DEFAULT_BH, DEFAULT_BW,
                                                DEFAULT_LAZY_MISS)
from raymarchrenderer_tpu.render.config import RenderConfig
from raymarchrenderer_tpu.scene.graph import Scene
from raymarchrenderer_tpu.scene.nodes import ShadeCtx

_PI = 3.14159265358979323846


@functools.partial(
    jax.jit,
    static_argnames=("scene", "cfg", "direct_light", "block", "interpret",
                     "mode", "n_samples", "lazy_miss"))
def trace_record_fused(scene: Scene, params, cfg: RenderConfig, eye: Vec3,
                       d0: Vec3, px, py, sample,
                       direct_light: bool = False,
                       block=(DEFAULT_BH, DEFAULT_BW),
                       interpret: bool = False,
                       corners=None, mode: str = "auto",
                       n_samples: int = 1,
                       lazy_miss: bool = DEFAULT_LAZY_MISS):
    """Run the full `trace_rgb` forward over arbitrary (H, W) ray planes in
    ONE Pallas launch and return the recorded march planes:

        {"t": (B, H, W) f32, "mid": (B, H, W) i32, "hit": (B, H, W) i32,
         "sd": (B * n_lights, H, W) f32}   # only when NEE

    B = cfg.max_bounces.  Inputs are planes (the sample-folded layout of
    `render_patch_spp` works directly: `sample` is a per-lane plane).
    Everything is detached — gradients come from the replay
    (`trace_rgb(march_impl="recorded", recorded=...)`).

    `mode="mega"` (the default when `corners` is given) records from the
    megakernel schedule (`render.mega.trace_mega_paths(record_banks=True)`:
    per-lane bounce progression, shadow marches as extra segments) — on a
    v5e this runs ~4× the bounce-synchronous `mode="wavefront"` fallback,
    whose per-bounce tile barriers cost Σ_b max_lanes(steps_b).

    `lazy_miss` (default: the render kernel's DEFAULT_LAZY_MISS, so the
    recorded forward runs the SAME estimator schedule as the production
    render) applies the boundary-deferred miss test inside the recording
    megakernel: ~6% off the recording kernel (the train step's dominant
    phase), banks bitwise-identical on scenes whose geometry sits well
    inside max_dist (tested; the same O(rare-lane) shell-grazing caveat
    as the render).  NEE recording stays STRICT regardless — lazy flips
    ~1e-5 of shadow-visibility verdicts (a discrete estimator change) —
    and the wavefront fallback tests misses per step by construction."""
    if scene.has_env_map:
        # round-5: env-map scenes record too.  The recorder traces
        # GEOMETRY only (t, mid, hit[, sd]) — the color output is
        # discarded and a missed path terminates, so no recorded value or
        # RR decision depends on the sky.  The kernels therefore skip the
        # sky eval entirely (the equirect gather stays in the XLA replay,
        # where trace_rgb(march_impl='recorded') computes it
        # differentiably), and the texture is not shipped into VMEM:
        params = dict(params)
        params["env"] = dict(params["env"])
        params["env"]["image"] = jnp.zeros((0, 0, 3), jnp.float32)
    if mode == "auto":
        mode = "mega" if corners is not None else "wavefront"
    if cfg.separate_channels and mode != "mega":
        raise NotImplementedError(
            "dispersion recording enumerates (sample, channel) paths — a "
            "megakernel-schedule mode (pass corners / mode='mega')")
    if mode == "mega" and corners is None:
        raise ValueError("mode='mega' needs the camera `corners` (the "
                         "megakernel regenerates primary rays in-kernel)")
    if n_samples > 1 and mode != "mega":
        raise ValueError("multi-sample recording (per-lane in-loop "
                         "regeneration) is a megakernel-schedule mode")
    params = lax.stop_gradient(params)
    if mode == "mega":
        return _record_mega(scene, params, cfg, corners, px, py, sample,
                            direct_light, block, interpret, n_samples,
                            lazy_miss=lazy_miss)
    # wavefront mode below: bounce-synchronous per-bounce marches test
    # the miss every step by construction — lazy_miss is a megakernel
    # schedule knob and simply does not apply here
    shape = jnp.shape(d0.x)
    h, w = shape
    B = cfg.max_bounces
    nee = direct_light and scene.n_lights > 0
    L = scene.n_lights if nee else 0

    bh, bw = min(block[0], h), min(block[1], w)
    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw

    leaves, treedef = jax.tree.flatten(params)
    leaves = [jnp.asarray(l, jnp.float32) for l in leaves]
    leaf_shapes = tuple((jnp.shape(l), int(l.size)) for l in leaves)
    leaves2d = [l.reshape(1, l.size) for l in leaves if l.size]
    n_shipped = len(leaves2d)

    f32, i32 = jnp.float32, jnp.int32
    planes = [jnp.asarray(a, f32) for a in
              (eye.x, eye.y, eye.z, d0.x, d0.y, d0.z)]
    planes.append(jnp.asarray(px).astype(i32))
    planes.append(jnp.asarray(py).astype(i32))
    # uint32 sample ids ship as bit-identical int32 (Mosaic-friendly)
    planes.append(lax.bitcast_convert_type(
        jnp.broadcast_to(jnp.asarray(sample).astype(jnp.uint32), shape),
        i32))
    if (hp, wp) != (h, w):
        planes = [jnp.pad(a, ((0, hp - h), (0, wp - w))) for a in planes]
    n_planes = len(planes)

    def kernel(*refs):
        from raymarchrenderer_tpu.render.integrator import get_normal, march
        param_refs = refs[:n_shipped]
        (ex, ey, ez, dx, dy, dz, pxr, pyr, sr) = refs[
            n_shipped:n_shipped + n_planes]
        outs = refs[n_shipped + n_planes:]
        if nee:
            t_ref, mid_ref, hit_ref, sd_ref = outs
        else:
            t_ref, mid_ref, hit_ref = outs
        rebuilt = []
        ri = 0
        for shp, size in leaf_shapes:
            if size == 0:
                rebuilt.append(jnp.zeros(shp, jnp.float32))
            else:
                rebuilt.append(param_refs[ri][:].reshape(shp))
                ri += 1
        p = jax.tree.unflatten(treedef, rebuilt)
        kpx = pxr[:]
        kpy = pyr[:]
        ksample = lax.bitcast_convert_type(sr[:], jnp.uint32)
        ones = jnp.ones((bh, bw), jnp.float32)
        ones3 = Vec3(ones, ones, ones)
        # padded lanes march as real rays (d may be zero — the map clamps
        # at max_dist so they miss immediately); their records are cropped

        def bounce_body(b, carry):
            o, d, color, inside, active = carry
            dist_mult = 1.0 - 2.0 * inside
            active_b = active > 0
            t, mid, hitm = march(scene, p, cfg, o, d, dist_mult, active_b)
            bu = jnp.asarray(b, i32)
            t_ref[bu] = t
            mid_ref[bu] = mid
            hit_ref[bu] = hitm.astype(i32)
            hitp = o + d * t
            normal = get_normal(scene, p, cfg, hitp)
            rng = RNGStream(cfg.seed, kpx, kpy, ksample, b)
            ctx = ShadeCtx(o, d, t, hitp, inside, normal, ones3, rng)
            s = scene.shade(p, ctx, mid)
            hit_active = active_b & hitm
            miss_active = active_b & ~hitm
            if scene.has_env_map:
                # sky feeds only terminated lanes' colors (discarded) —
                # skip the env gather in-kernel (see trace_record_fused)
                mult = vselect(hit_active, s.color, ones3)
            else:
                sky = scene.sky(p, d)
                mult = vselect(hit_active, s.color,
                               vselect(miss_active, sky, ones3))
            color = color * mult
            new_inside_b = s.inside.x > 0.5
            inside = jnp.where(hit_active, new_inside_b.astype(f32), inside)
            term = (s.dir.x == 0.0) & (s.dir.y == 0.0) & (s.dir.z == 0.0)
            active_n = hit_active & ~term
            if nee:
                # shadow marches with the oracle's exact keying
                # (`integrator._direct_light`); only the visibility t is
                # recorded — the replay recomputes the contribution math
                # differentiably
                nrng = rng.fork(7)
                o_sh = hitp + normal * cfg.surface_offset
                for li in range(L):
                    lrng = nrng.fork(101 + li)
                    lpos, lpower, lradius = scene.light(p, li)
                    jit = uniform_sphere(lrng.next(), lrng.next()) * lradius
                    target = lpos + jit
                    delta = target - hitp
                    dist_l = delta.length()
                    ldir = delta / jnp.maximum(dist_l, 1e-8)
                    sd, _, _ = march(scene, p, cfg, o_sh, ldir, ones,
                                     active_n, t_max=dist_l)
                    # resolve visibility HERE: unoccluded rays end at
                    # sd == dist_l exactly, so the replay re-deriving
                    # dist_l (one ulp off under a different compilation)
                    # would flip `sd >= dist_l` on every lit lane.  Bank
                    # a saturated sd whose comparison is ulp-proof.
                    sd_ref[bu * L + li] = jnp.where(
                        sd >= dist_l, jnp.float32(3.4e38), 0.0)
            if cfg.rr_start_bounce >= 0:
                pr = jnp.clip(
                    jnp.maximum(color.x, jnp.maximum(color.y, color.z)),
                    cfg.rr_min_prob, 1.0)
                u = rng.fork(13).next()
                do_rr = active_n & (b >= cfg.rr_start_bounce)
                kill = do_rr & (u >= pr)
                scale = jnp.where(do_rr & ~kill, 1.0 / pr, 1.0)
                color = vselect(kill, Vec3.zeros((bh, bw)), color * scale)
                active_n = active_n & ~kill
            override = ((s.hit.x != 0.0) | (s.hit.y != 0.0)
                        | (s.hit.z != 0.0))
            off = jnp.where(new_inside_b, -cfg.inside_offset,
                            cfg.exit_offset)
            o_next = vselect(override, s.hit, hitp + normal * off)
            o = vselect(active_n, o_next, o)
            d = vselect(active_n, s.dir, d)
            return (o, d, color, inside, active_n.astype(i32))

        o0 = Vec3(ex[:], ey[:], ez[:])
        dd0 = Vec3(dx[:], dy[:], dz[:])
        init = (o0, dd0, ones3,
                jnp.zeros((bh, bw), f32), jnp.ones((bh, bw), i32))
        # peel bounce 0 (concrete Mosaic layouts), then fori the rest —
        # each bounce's march early-outs per tile, so post-termination
        # bounces cost one loop-condition check
        carry = bounce_body(0, init)
        lax.fori_loop(1, B, bounce_body, carry)

    tile = pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    bank = lambda n: pl.BlockSpec((n, bh, bw), lambda i, j: (0, i, j),
                                  memory_space=pltpu.VMEM)
    small_vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_specs = [bank(B)] * 3
    out_shapes = [jax.ShapeDtypeStruct((B, hp, wp), f32),
                  jax.ShapeDtypeStruct((B, hp, wp), i32),
                  jax.ShapeDtypeStruct((B, hp, wp), i32)]
    if nee:
        out_specs.append(bank(B * L))
        out_shapes.append(jax.ShapeDtypeStruct((B * L, hp, wp), f32))
    outs = pl.pallas_call(
        kernel,
        grid=(hp // bh, wp // bw),
        in_specs=[small_vmem] * n_shipped + [tile] * n_planes,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(*leaves2d, *planes)
    crop = lambda a: a[:, :h, :w]
    rec = {"t": crop(outs[0]), "mid": crop(outs[1]), "hit": crop(outs[2])}
    if nee:
        rec["sd"] = crop(outs[3])
    return rec


def _record_mega(scene: Scene, params, cfg: RenderConfig, corners, px, py,
                 sample, direct_light: bool, block, interpret: bool,
                 n_samples: int = 1, lazy_miss: bool = False):
    # (see trace_record_fused; dispersion banks fold per channel below)
    """Megakernel-schedule recorder: per-lane bounce progression with
    banked residual writes at the shade/resolve passes
    (`render.mega.trace_mega_paths(record_banks)`).

    `n_samples=1`: one path per lane (the caller's sample-folded plane
    layout).  `n_samples=S>1`: px/py are plain (H, W) pixel planes and
    each lane traces its S samples with IN-LOOP REGENERATION — the
    straggler amortization that lifts the render megakernel — banking
    into (bounce, sample) slots; the returned planes are reshaped to the
    replay's sample-folded (B, S·H, W) layout, so the consumer is
    unchanged."""
    from raymarchrenderer_tpu.render.mega import trace_mega_paths

    shape = jnp.shape(px)
    h, w = shape
    B = cfg.max_bounces
    S = int(n_samples)
    disp = bool(cfg.separate_channels)
    P = 3 * S if disp else S  # banked path slots per bounce
    nee = direct_light and scene.n_lights > 0
    L = scene.n_lights if nee else 0
    bh, bw = min(block[0], h), min(block[1], w)
    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw
    march_unroll = 1 if interpret else 32

    leaves, treedef = jax.tree.flatten(params)
    leaves = [jnp.asarray(l, jnp.float32) for l in leaves]
    leaf_shapes = tuple((jnp.shape(l), int(l.size)) for l in leaves)
    leaves2d = [l.reshape(1, l.size) for l in leaves if l.size]
    n_shipped = len(leaves2d)

    f32, i32 = jnp.float32, jnp.int32
    planes = [jnp.asarray(px).astype(i32), jnp.asarray(py).astype(i32),
              lax.bitcast_convert_type(
                  jnp.broadcast_to(jnp.asarray(sample).astype(jnp.uint32),
                                   shape), i32)]
    if (hp, wp) != (h, w):
        # padded lanes trace real rays at out-of-frame coords; cropped
        planes = [jnp.pad(a, ((0, hp - h), (0, wp - w))) for a in planes]
    corners_arr = jnp.stack([jnp.asarray(c, jnp.float32) for c in corners])

    def kernel(corners_ref, *refs):
        param_refs = refs[:n_shipped]
        pxr, pyr, sr = refs[n_shipped:n_shipped + 3]
        outs = refs[n_shipped + 3:]
        if nee:
            t_ref, mid_ref, hit_ref, sd_ref = outs
        else:
            t_ref, mid_ref, hit_ref = outs
        rebuilt = []
        ri = 0
        for shp, size in leaf_shapes:
            if size == 0:
                rebuilt.append(jnp.zeros(shp, jnp.float32))
            else:
                rebuilt.append(param_refs[ri][:].reshape(shp))
                ri += 1
        p = jax.tree.unflatten(treedef, rebuilt)
        kcorners = tuple(corners_ref[k, :] for k in range(5))
        kpx = pxr[:]
        kpy = pyr[:]
        ksample = lax.bitcast_convert_type(sr[:], jnp.uint32)
        ch = Vec3.full((bh, bw), 1.0, 1.0, 1.0)
        _, rec = trace_mega_paths(scene, p, cfg, kcorners, kpx, kpy,
                                  ksample, ch, n_samples=S,
                                  shade_gate=0.0,
                                  march_unroll=march_unroll,
                                  regen_cadence=(0 if march_unroll == 1
                                                 else 16),
                                  dispersion=disp,
                                  direct_light=direct_light,
                                  record_banks=True,
                                  # NEE stays strict even when lazy is
                                  # requested: lazy flips ~1e-5 of sd
                                  # visibility verdicts (a DISCRETE
                                  # estimator change, unlike the bitwise
                                  # geometry banks) — measured on an
                                  # enclosed room, tools note in
                                  # docs/performance.md
                                  lazy_miss=lazy_miss and not nee
                                  and march_unroll > 1)
        # stacked banks: one copy per output ref (see mega._MegaState.rec)
        t_ref[:] = rec[0]
        mid_ref[:] = rec[1]
        hit_ref[:] = rec[2]
        if nee:
            sd_ref[:] = rec[3]

    tile = pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    bank = lambda n: pl.BlockSpec((n, bh, bw), lambda i, j: (0, i, j),
                                  memory_space=pltpu.VMEM)
    small_vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    BS = B * P
    out_specs = [bank(BS)] * 3
    out_shapes = [jax.ShapeDtypeStruct((BS, hp, wp), f32),
                  jax.ShapeDtypeStruct((BS, hp, wp), i32),
                  jax.ShapeDtypeStruct((BS, hp, wp), i32)]
    if nee:
        out_specs.append(bank(BS * L))
        out_shapes.append(jax.ShapeDtypeStruct((BS * L, hp, wp), f32))
    outs = pl.pallas_call(
        kernel,
        grid=(hp // bh, wp // bw),
        in_specs=[small_vmem] * (n_shipped + 1) + [tile] * 3,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(corners_arr, *leaves2d, *planes)
    crop = lambda a: a[:, :h, :w]

    if disp:
        # slot b·3S + (3s + ci): fold to per-CHANNEL sample-folded banks
        # (3, B, S·H, W) — the replay's channel loop slices [ci] and gets
        # exactly the RGB recorded layout
        def fold(a):
            return a.reshape(B, S, 3, h, w).transpose(2, 0, 1, 3, 4) \
                    .reshape(3, B, S * h, w)

        rec = {"t": fold(crop(outs[0])), "mid": fold(crop(outs[1])),
               "hit": fold(crop(outs[2]))}
        if nee:
            sd = crop(outs[3]).reshape(B, S, 3, L, h, w)
            rec["sd"] = sd.transpose(2, 0, 3, 1, 4, 5) \
                          .reshape(3, B * L, S * h, w)
        return rec

    def fold(a):
        # slot b·S+s → the replay's sample-folded (B, S·H, W) layout
        return a.reshape(B, S, h, w).reshape(B, S * h, w)

    rec = {"t": fold(crop(outs[0])), "mid": fold(crop(outs[1])),
           "hit": fold(crop(outs[2]))}
    if nee:
        # slot (b·S+s)·L+li → (B·L, S·H, W) with replay index b·L+li
        sd = crop(outs[3]).reshape(B, S, L, h, w)
        rec["sd"] = sd.transpose(0, 2, 1, 3, 4).reshape(B * L, S * h, w)
    return rec


def trace_record_fused_spectral(scene: Scene, params, mats,
                                cfg: RenderConfig, corners, px, py, sample0,
                                n_samples: int = 1,
                                block=(DEFAULT_BH, DEFAULT_BW),
                                interpret: bool = False,
                                lazy_miss: bool = DEFAULT_LAZY_MISS):
    """Spectral recorder (round 5): the gen-3 megakernel schedule traces
    every (sample, bounce) march in ONE Pallas launch and banks the
    (t, mid, hit) residuals the differentiable spectral replay consumes
    (`spectral_integrator.trace_spectral(march_impl='recorded')`).

    Geometry is band-VALUE independent: gen-3 directions are
    uniform-hemisphere draws and the recorder terminates only on emitter
    hits / misses (the soft replay's rule — `_apply_band_soft` attenuates
    instead of absorbing), so one recording serves every band-table
    update of a train step.  Returns {"t","mid","hit"} in the replay's
    sample-folded (B, S·H, W) layout."""
    from raymarchrenderer_tpu.render.mega import trace_mega_spectral

    params = lax.stop_gradient(params)
    mats = lax.stop_gradient(mats)
    shape = jnp.shape(px)
    h, w = shape
    B = cfg.max_bounces
    S = int(n_samples)
    bh, bw = min(block[0], h), min(block[1], w)
    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw
    march_unroll = 1 if interpret else 32

    combined = {"scene": params, "mats": mats}
    leaves, treedef = jax.tree.flatten(combined)
    leaves = [jnp.asarray(l) for l in leaves]
    leaf_meta = tuple((jnp.shape(l), int(l.size), l.dtype) for l in leaves)
    leaves2d = [l.reshape(1, l.size) for l in leaves if l.size]
    n_shipped = len(leaves2d)

    f32, i32 = jnp.float32, jnp.int32
    planes = [jnp.asarray(px).astype(i32), jnp.asarray(py).astype(i32)]
    if (hp, wp) != (h, w):
        planes = [jnp.pad(a, ((0, hp - h), (0, wp - w))) for a in planes]
    corners_arr = jnp.stack([jnp.asarray(c, jnp.float32) for c in corners])
    s0_arr = jnp.asarray(sample0, jnp.uint32).astype(i32).reshape(1, 1)

    def kernel(corners_ref, s0_ref, *refs):
        param_refs = refs[:n_shipped]
        pxr, pyr = refs[n_shipped:n_shipped + 2]
        t_ref, mid_ref, hit_ref = refs[n_shipped + 2:]
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
        kcorners = tuple(corners_ref[k, :] for k in range(5))
        s0 = s0_ref[0, 0].astype(jnp.uint32)
        _, rec = trace_mega_spectral(scene, p, m, cfg, kcorners,
                                     pxr[:], pyr[:], s0, n_samples=S,
                                     shade_gate=0.0,
                                     march_unroll=march_unroll,
                                     regen_cadence=(0 if march_unroll == 1
                                                    else 16),
                                     record_banks=True,
                                     lazy_miss=lazy_miss
                                     and march_unroll > 1)
        t_ref[:] = rec[0]
        mid_ref[:] = rec[1]
        hit_ref[:] = rec[2]

    tile = pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    bank = lambda n: pl.BlockSpec((n, bh, bw), lambda i, j: (0, i, j),
                                  memory_space=pltpu.VMEM)
    small_vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    BS = B * S
    outs = pl.pallas_call(
        kernel,
        grid=(hp // bh, wp // bw),
        in_specs=[small_vmem, pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [small_vmem] * n_shipped + [tile] * 2,
        out_specs=(bank(BS), bank(BS), bank(BS)),
        out_shape=(jax.ShapeDtypeStruct((BS, hp, wp), f32),
                   jax.ShapeDtypeStruct((BS, hp, wp), i32),
                   jax.ShapeDtypeStruct((BS, hp, wp), i32)),
        interpret=interpret,
    )(corners_arr, s0_arr, *leaves2d, *planes)
    crop = lambda a: a[:, :h, :w]

    def fold(a):
        return a.reshape(B, S, h, w).reshape(B, S * h, w)

    return {"t": fold(crop(outs[0])), "mid": fold(crop(outs[1])),
            "hit": fold(crop(outs[2]))}
