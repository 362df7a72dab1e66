"""Static VPU issue-slot breakdown of the spectral megakernel loop.

Round-4's roofline argument (docs/performance.md "issue-slot accounting")
estimated ~70 ops per march slot by hand.  This tool mechanizes it: it
traces the ACTUAL loop pieces (march_step / miss_pass / mark_misses /
parked_pass — exposed via `trace_mega_spectral(_introspect=...)`) to
jaxprs and counts elementwise vector ops per lane, so

  * the per-step cost of every candidate op-cut is measurable BEFORE a
    TPU bench run, and
  * the speed-of-light claim is auditable: every counted op is a real
    primitive in the traced program, not an estimate.

Counting rule: one issue slot per elementwise primitive on a lane plane
(transcendentals/div/sqrt count 1 — they cost MORE on the VPU, so the
derived ceiling is an UPPER bound and "measured ≈ ceiling" is the
conservative direction for a wall proof).  Scalar ops and broadcasts
count 0.

Run (host-only trace, no TPU needed):
  env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/issue_breakdown.py
"""
import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from raymarchrenderer_tpu.core.camera import Camera  # noqa: E402
from raymarchrenderer_tpu.render import mega  # noqa: E402
from raymarchrenderer_tpu.render.config import RenderConfig  # noqa: E402
from raymarchrenderer_tpu.render.raygen import pixel_grid  # noqa: E402
from raymarchrenderer_tpu.render.spectral_integrator import (  # noqa: E402
    spectral_demo)

# ops that are free at the vector-issue level
_FREE = {"broadcast_in_dim", "reshape", "squeeze", "copy", "stop_gradient",
         "transpose", "slice", "concatenate"}
# whole-plane reductions (the shade-gate path; not in the default schedule)
_REDUCE = {"reduce_sum", "reduce_min", "reduce_max", "reduce_and",
           "reduce_or", "argmin", "argmax"}

H, W = 32, 128  # one lane tile; counts are per-lane so the shape cancels


def _is_plane(aval) -> bool:
    return getattr(aval, "shape", ()) == (H, W)


def count_jaxpr(jaxpr, counter: Counter):
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        for sub in jax.core.jaxprs_in_params(eqn.params) \
                if hasattr(jax.core, "jaxprs_in_params") else []:
            count_jaxpr(sub, counter)
        # recurse into call/scan/cond bodies
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):  # ClosedJaxpr
                count_jaxpr(v.jaxpr, counter)
            elif isinstance(v, (list, tuple)):
                for it in v:
                    if hasattr(it, "jaxpr"):
                        count_jaxpr(it.jaxpr, counter)
        if prim in ("pjit", "jit", "custom_jvp_call", "custom_vjp_call",
                    "custom_vjp_call_jaxpr", "remat", "checkpoint",
                    "closed_call", "scan", "while", "cond"):
            continue  # sub-jaxprs already counted
        if prim in _FREE:
            continue
        out_plane = any(_is_plane(o.aval) for o in eqn.outvars)
        in_plane = any(_is_plane(getattr(i, "aval", None))
                       for i in eqn.invars if hasattr(i, "aval"))
        if out_plane or (prim in _REDUCE and in_plane):
            counter[prim] += 1


def ops_of(fn, *args) -> Counter:
    c = Counter()
    count_jaxpr(jax.make_jaxpr(fn)(*args).jaxpr, c)
    return c


def total(c: Counter) -> int:
    return sum(c.values())


def main():
    scene, params, mats = spectral_demo()
    cfg = RenderConfig(width=W, height=H, max_steps=512, max_bounces=16,
                       max_dist=1000.0, relax_omega=2.0, normal_taps=4)
    corners = Camera(aspect=1.0).corner_rays_flat()
    px, py = pixel_grid(W, H)

    pieces = {}
    mega.trace_mega_spectral(scene, params, mats, cfg, corners, px, py,
                             jnp.uint32(0), n_samples=128, march_unroll=32,
                             lazy_miss=True, regen_cadence=16,
                             _introspect=pieces)
    init = pieces["init"]

    # component reference points
    p = init.o
    c_map = ops_of(lambda q: scene.map_dist(params, q, cfg.max_dist), p)
    report = {"map_dist": dict(total=total(c_map), ops=dict(c_map))}

    for name in ("march_step", "mark_misses", "miss_pass", "shade",
                 "regen", "parked_pass"):
        c = ops_of(pieces[name], init)
        report[name] = dict(total=total(c), ops=dict(c))

    unroll, cadence = 32, 16
    n_mid = unroll // cadence - 1
    per_iter = (unroll * report["march_step"]["total"]
                + n_mid * (report["mark_misses"]["total"]
                           + report["miss_pass"]["total"])
                + report["mark_misses"]["total"]
                + report["parked_pass"]["total"])
    per_step = per_iter / unroll
    march_bookkeeping = report["march_step"]["total"] - report["map_dist"]["total"]

    # v5e TensorCore VPU: 8 sublanes x 128 lanes x 4 issue = 4096 lane-ops
    # per cycle at 0.94 GHz (docs/performance.md round-3 accounting)
    capacity = 4096 * 0.94e9
    sol_steps_per_s = capacity / per_step  # executed march slots/s ceiling

    print(json.dumps({
        "per_march_step": {
            "total": report["march_step"]["total"],
            "map_dist": report["map_dist"]["total"],
            "bookkeeping": march_bookkeeping},
        "pass_costs": {k: report[k]["total"] for k in
                       ("mark_misses", "miss_pass", "shade", "regen",
                        "parked_pass")},
        "schedule": {"unroll": unroll, "cadence": cadence,
                     "amortized_ops_per_step": round(per_step, 2)},
        "ceiling": {
            "vpu_lane_ops_per_s": capacity,
            "executed_march_slots_per_s_ceiling": sol_steps_per_s},
    }, indent=1))
    print()
    for k in ("march_step", "shade", "regen", "miss_pass", "mark_misses",
              "parked_pass"):
        print(f"-- {k}: {report[k]['total']} ops")
        for op, n in sorted(report[k]["ops"].items(), key=lambda t: -t[1]):
            print(f"     {op:28s} {n}")


if __name__ == "__main__":
    main()
