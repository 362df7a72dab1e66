"""IO tests: BMP/PNG encode, PNG round-trip, checkpoint resume."""
import os
import struct

import numpy as np

from raymarchrenderer_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from raymarchrenderer_tpu.io.image import (
    load_png, save_bmp, save_png, timestamp_name, to_srgb_u8,
)
from raymarchrenderer_tpu.render.config import RenderConfig


def _gradient(h=16, w=32):
    x = np.linspace(0, 1, w, dtype=np.float32)
    img = np.zeros((h, w, 3), np.float32)
    img[..., 0] = x
    img[..., 1] = 0.25
    return img


class TestImage:
    def test_bmp_header(self, tmp_path):
        p = str(tmp_path / "x.bmp")
        save_bmp(p, _gradient())
        raw = open(p, "rb").read()
        assert raw[:2] == b"BM"
        w, h = struct.unpack("<ii", raw[18:26])
        assert (w, h) == (32, 16)
        bpp = struct.unpack("<H", raw[28:30])[0]
        assert bpp == 24

    def test_png_roundtrip(self, tmp_path):
        p = str(tmp_path / "x.png")
        img = _gradient()
        save_png(p, img)
        back = load_png(p)
        # round trip through 8-bit sRGB: ~1/255 quantization in sRGB space
        assert back.shape == img.shape
        assert np.abs(to_srgb_u8(back).astype(int)
                      - to_srgb_u8(img).astype(int)).max() <= 1

    def test_timestamp_name(self):
        import datetime
        n = timestamp_name("bmp", datetime.datetime(2015, 7, 11, 1, 41, 3))
        assert n == "2015-07-11_01-41-03.bmp"  # Program.cpp:71-84 format


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "ckpt.npz")
        cfg = RenderConfig(width=32, height=16, spp=7, seed=3)
        accum = _gradient()
        save_checkpoint(p, accum, 5.0, cfg)
        st = load_checkpoint(p)
        np.testing.assert_array_equal(st.accum, accum)
        assert st.n == 5.0
        assert st.cfg == cfg
