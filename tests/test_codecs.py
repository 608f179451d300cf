"""Pure-python PNG codec + lossy stand-in invariants."""

import numpy as np
import pytest

from xoverrr_spark.codecs.png import (
    decode_image,
    decode_png,
    encode_image,
    encode_png,
    psnr,
    quantize_lossy,
)


def _px(seed, h=16, w=16):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_png_roundtrip_lossless():
    px = _px(1)
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_lossy_standin_psnr_above_40():
    px = _px(2, 32, 32)
    dec = decode_image(encode_image(px, "jpeg"), "jpeg")
    assert np.array_equal(dec, quantize_lossy(px))
    assert psnr(px, dec) >= 40.0


def test_identical_psnr_inf():
    px = _px(3)
    assert psnr(px, px) == float("inf")


def test_unknown_fmt_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", "webp")


def test_not_png_raises():
    with pytest.raises(ValueError):
        decode_png(b"definitely not a png")
