"""Image codec kernels for the ``images`` payload corpus.

The reference only stores raw asset bytes
(/root/reference/api_clients/wayback_client.py:33;
file_handler.py:267-268); the graft target (BASELINE.json:6,15) adds
decode + fidelity invariants: decoded-pixel allclose, PSNR>=40dB for
lossy formats, exact for lossless.

This container has no PIL/imageio, so:
- PNG (lossless) is a REAL codec: stdlib zlib, 8-bit RGB, scanline
  filters (encode uses filter 0; decode supports filters 0-4) —
  byte-exact roundtrip, validated against the PNG spec structure.
- JPEG decode is STUBBED behind a deterministic fake codec
  ('FJPG' magic: channel quantization step 4 + zlib) so the lossy-path
  plumbing (schema, Arrow batching, PSNR gate) is real and testable.
  Quantization step 4 gives PSNR ~= 10*log10(255^2/(q^2/12)) ~ 47dB,
  deterministically above the 40dB gate. With PIL installed,
  ``decode_image`` dispatches to it for real JPEG bytes instead
  (import-gated), marked NotImplementedError otherwise.

All functions are numpy-vectorized per image and called from
Arrow-batched pandas UDFs over ``bytes:binary`` columns — never
per-row Python at the Spark level.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # pragma: no cover - not in sandbox
    from PIL import Image  # type: ignore  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_FJPG_MAGIC = b"FJPG"
_FJPG_Q = 4  # quantization step of the deterministic lossy stub


def _chunk(kind: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + kind
        + payload
        + struct.pack(">I", zlib.crc32(kind + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """8-bit RGB HxWx3 array -> PNG bytes (filter 0 scanlines)."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 3 and pixels.shape[2] == 3
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, colortype 2 (RGB)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, w: int, h: int, bpp: int = 3) -> np.ndarray:
    stride = w * bpp
    out = np.zeros((h, stride), np.uint8)
    pos = 0
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw[pos : pos + stride], np.uint8).astype(np.int32)
        pos += stride
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub
            rec = line.copy()
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            rec = line.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line.copy()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w, bpp)


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        kind = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if kind == b"IHDR":
            w, h, bits, ctype = struct.unpack(">IIBB", payload[:10])
            if bits != 8 or ctype != 2:
                raise NotImplementedError("only 8-bit RGB PNGs supported")
        elif kind == b"IDAT":
            idat += payload
        elif kind == b"IEND":
            break
    raw = zlib.decompress(idat)
    return _unfilter(raw, w, h)


def encode_fake_jpeg(pixels: np.ndarray, q: int = _FJPG_Q) -> bytes:
    """Deterministic lossy stub: quantize channels to step q, zlib."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 3
    h, w = pixels.shape[:2]
    quant = (pixels.astype(np.int32) // q).astype(np.uint8)
    return (
        _FJPG_MAGIC
        + struct.pack(">IIB", w, h, q)
        + zlib.compress(quant.tobytes(), 6)
    )


def decode_fake_jpeg(data: bytes) -> np.ndarray:
    if not data.startswith(_FJPG_MAGIC):
        raise ValueError("not FJPG")
    w, h, q = struct.unpack(">IIB", data[4:13])
    quant = np.frombuffer(zlib.decompress(data[13:]), np.uint8).reshape(h, w, 3)
    # dequantize to bin centers, clipped
    return np.clip(quant.astype(np.int32) * q + q // 2, 0, 255).astype(np.uint8)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch by declared format. Real JPEG bytes require PIL
    (clearly-marked stub; the Spark plumbing around this is real)."""
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        if data.startswith(_FJPG_MAGIC):
            return decode_fake_jpeg(data)
        if _HAVE_PIL:  # pragma: no cover
            import io

            return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        raise NotImplementedError(
            "real JPEG decode requires PIL (not in this container); "
            "deterministic FJPG stub bytes are supported"
        )
    raise ValueError(f"unknown format {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash64(pixels: np.ndarray) -> int:
    """64-bit block-mean perceptual hash (aHash): grayscale -> 8x8
    block means -> threshold at mean -> signed int64 (row-major bits)."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    blocks = np.array(
        [
            [gray[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean() for j in range(8)]
            for i in range(8)
        ]
    )
    bits = (blocks > blocks.mean()).astype(np.uint64).ravel()
    val = np.uint64(0)
    for bit in bits:
        val = (val << np.uint64(1)) | bit
    iv = int(val)
    return iv - (1 << 64) if iv >= (1 << 63) else iv
