"""Minimal deterministic PNG codec (pure Python + numpy + zlib).

The image/audio libraries are not available in this container, so the
image+caption corpus (BASELINE.json ``input_hint``) is built with this
self-contained codec: a real, spec-conformant PNG encoder/decoder for
8-bit RGB, losslessly round-trippable — which makes the per-row
"decoded pixels PSNR >= 40 dB" invariant a REAL check, not a mock.

The "lossy" path (``fmt='jpeg'`` rows in the corpus) is a documented
stand-in: pixels are quantized to 6 bits/channel before PNG-encoding,
which yields PSNR ~= 46-49 dB vs the source — above the 40 dB gate,
below lossless — exercising the PSNR code path deterministically
without a JPEG library. The Spark-side plumbing (binary column,
mapInPandas decode, batch shapes) is identical to what a real JPEG
decoder would use; swap ``decode_png``/``encode_png`` for
PIL/turbojpeg in production.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as an RGB8 PNG (filter 0)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # RGB8
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode an RGB8 PNG (all 5 scanline filters) to (h, w, 3) uint8."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = bitdepth = coltype = 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, coltype = struct.unpack(">IIBB", body[:10])
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if bitdepth != 8 or coltype != 2:
        raise ValueError("only RGB8 supported")
    raw = zlib.decompress(idat)
    stride = w * 3
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int32)
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub
            rec = line.copy()
            for x in range(3, stride):
                rec[x] = (rec[x] + rec[x - 3]) & 0xFF
        elif ft == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ft == 3:  # Average
            rec = line.copy()
            for x in range(stride):
                left = rec[x - 3] if x >= 3 else 0
                rec[x] = (rec[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            rec = line.copy()
            for x in range(stride):
                a = rec[x - 3] if x >= 3 else 0
                b = int(prev[x])
                c = int(prev[x - 3]) if x >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pr) & 0xFF
        else:
            raise ValueError(f"bad filter {ft}")
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    return out.reshape(h, w, 3)


def quantize_lossy(pixels: np.ndarray, bits: int = 6) -> np.ndarray:
    """6-bit/channel quantization: the deterministic 'lossy codec'
    stand-in (PSNR ~= 47 dB vs source — exercises the >=40 dB gate)."""
    step = 256 >> bits
    q = (pixels.astype(np.int32) // step) * step + step // 2
    return np.clip(q, 0, 255).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def average_hash64(pixels: np.ndarray) -> int:
    """64-bit perceptual (average) hash: grayscale -> 8x8 mean-pool ->
    threshold at the mean -> bit per cell. Deterministic, numpy-only."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            cells[i, j] = gray[ys[i] : max(ys[i + 1], ys[i] + 1),
                               xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    bits = (cells > cells.mean()).flatten()
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    return val - (1 << 64) if val >= (1 << 63) else val  # signed int64
