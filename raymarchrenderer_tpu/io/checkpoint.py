"""Checkpoint / resume of progressive renders.

The reference's accumulation buffer IS its checkpoint: the running mean keyed
by `currentSample` stays valid at any interruption (`RayMarch3.glsl:542-554`,
Escape-to-cancel `Program.cpp:188-194`).  We persist the resumable triple
`(accum, n_samples, seed)` plus the render config, as a single .npz —
restartable on any host/chip count because the RNG is counter-based
(no generator state to save).
"""
from __future__ import annotations

import dataclasses
import json
from typing import NamedTuple

import numpy as np

from raymarchrenderer_tpu.render.config import RenderConfig


class RenderState(NamedTuple):
    accum: np.ndarray   # (H, W, 3) float32 linear running mean
    n: float            # samples accumulated so far
    cfg: RenderConfig


def save_checkpoint(path: str, accum, n: float, cfg: RenderConfig) -> None:
    np.savez_compressed(
        path,
        accum=np.asarray(accum, np.float32),
        n=np.float64(n),
        config=np.frombuffer(cfg.to_json().encode(), dtype=np.uint8))


def load_checkpoint(path: str) -> RenderState:
    with np.load(path) as z:
        cfg = RenderConfig.from_json(bytes(z["config"].tobytes()).decode())
        return RenderState(z["accum"], float(z["n"]), cfg)
