"""Pure-numpy baseline DCT image codec — a real frequency-domain lossy
codec (JPEG's actual lossy mechanism: YCbCr + 8x8 block DCT-II +
quality-scaled quantization tables), replacing the per-pixel quantization
stand-in for fmt='jpeg' rows (VERDICT r02 stretch item).

What is real vs. JPEG: the color transform, the 8x8 orthonormal DCT, the
standard ITU-T T.81 Annex K luminance quantization table with the usual
quality scaling, and the dequantize+IDCT reconstruction — i.e. the entire
LOSSY part of the pipeline. What is simplified: no zig-zag/Huffman entropy
coding (zlib over the quantized int16 coefficients instead — entropy coding
is lossless, so PSNR semantics are identical) and 4:4:4 with the luma table
for all three channels (no chroma subsampling; the synthetic fixtures are
uniform noise, the worst case for transform coding, and subsampled chroma
would sink PSNR below the >= 40 dB invariant the input_hint mandates).

Container layout (little-endian):
    b"DCT1" | u16 h | u16 w | u8 quality | zlib(int16 Y,Cb,Cr coeff blocks)

Deterministic: same pixels + quality -> byte-identical output.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"DCT1"
DEFAULT_DCT_QUALITY = 98  # min PSNR ~44 dB even on uniform-noise images

# ITU-T T.81 Annex K table K.1 (luminance)
_Q_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)


def quant_table(quality: int) -> np.ndarray:
    """Quality-scaled table, the standard IJG scaling law."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((_Q_LUMA * scale + 50) / 100), 1, 255)


def _dct_matrix() -> np.ndarray:
    """8x8 orthonormal DCT-II matrix (D @ x applies the 1-D transform)."""
    k = np.arange(8)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * np.sqrt(2 / 8)
    m[0] /= np.sqrt(2)
    return m


_D = _dct_matrix()


def _to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ],
        axis=-1,
    )


def _to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _to_blocks(ch: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Edge-pad a 2-D channel to 8x8 multiples, return (nblocks, 8, 8)."""
    h, w = ch.shape
    hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(ch, ((0, hp - h), (0, wp - w)), mode="edge")
    return (
        p.reshape(hp // 8, 8, wp // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8),
        hp,
        wp,
    )


def _from_blocks(blocks: np.ndarray, hp: int, wp: int, h: int, w: int) -> np.ndarray:
    return (
        blocks.reshape(hp // 8, wp // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(hp, wp)[:h, :w]
    )


def encode_dct(pixels: np.ndarray, quality: int = DEFAULT_DCT_QUALITY) -> bytes:
    """RGB8 HxWx3 uint8 -> DCT1 container bytes (lossy)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("expected HxWx3 uint8 array")
    h, w, _ = pixels.shape
    if h > 0xFFFF or w > 0xFFFF:
        raise ValueError("image too large for DCT1 container")
    t = quant_table(quality)
    ycc = _to_ycbcr(pixels)
    payload = []
    for c in range(3):
        blocks, _, _ = _to_blocks(ycc[..., c] - 128.0)
        coeffs = np.einsum("ij,njk,lk->nil", _D, blocks, _D)
        payload.append(np.round(coeffs / t).astype("<i2").tobytes())
    return (
        MAGIC
        + struct.pack("<HHB", h, w, quality)
        + zlib.compress(b"".join(payload), 6)
    )


def decode_dct(data: bytes) -> np.ndarray:
    """DCT1 container bytes -> RGB8 HxWx3 uint8 (dequantize + IDCT)."""
    if data[:4] != MAGIC:
        raise ValueError("not a DCT1 container")
    h, w, quality = struct.unpack("<HHB", data[4:9])
    t = quant_table(quality)
    hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
    nblocks = (hp // 8) * (wp // 8)
    raw = np.frombuffer(zlib.decompress(data[9:]), dtype="<i2")
    if raw.size != 3 * nblocks * 64:
        raise ValueError("corrupt DCT1 payload")
    chans = raw.reshape(3, nblocks, 8, 8).astype(np.float64)
    out = np.empty((h, w, 3), dtype=np.float64)
    for c in range(3):
        rec = np.einsum("ji,njk,kl->nil", _D, chans[c] * t, _D)
        out[..., c] = _from_blocks(rec, hp, wp, h, w) + 128.0
    return _to_rgb(out)
