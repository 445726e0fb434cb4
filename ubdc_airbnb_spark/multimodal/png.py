"""Pure-stdlib PNG codec (zlib + struct): the real decode kernel for the
multimodal binary-column pipeline — no PIL/imageio needed, so the decode
stage runs anywhere Python does.

Scope (raises ValueError outside it, loudly — never a wrong pixel):
8-bit depth, color types 0 (grayscale), 2 (RGB), 4 (gray+alpha) and
6 (RGBA), non-interlaced, with full chunk-CRC verification and all five
scanline filters (None/Sub/Up/Average/Paeth) per the PNG spec
(RFC 2083 §6). Palette (type 3), 16-bit and Adam7 inputs are rejected —
the fail-closed contract for a training-data pipeline where a silently
misdecoded image poisons features downstream.

The encoder exists for fixtures and tests: it writes spec-valid PNGs
with a caller-chosen filter type per scanline, so round-trip tests and
the ``mm_decode_png`` oracle gate exercise every unfilter path.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 2: 4, 4: 6}  # channels -> color type


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG filter 4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa = abs(p - a)
    pb = abs(p - b)
    pc = abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG byte string → (width, height, channels, pixels) with
    ``pixels`` the raw row-major samples (len == width·height·channels).
    Verifies every chunk CRC and the IDAT zlib stream; rejects anything
    outside the supported profile (see module docstring)."""
    if len(data) < 8 or data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = channels = -1
    idat = bytearray()
    seen_end = False
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth} (only 8)")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color} (0/2/4/6)")
            if comp != 0 or filt != 0:
                raise ValueError("unsupported compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced (Adam7) PNG not supported")
            if width == 0 or height == 0:
                raise ValueError("zero-dimension image")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            seen_end = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped by construction
        pos += 12 + length
    if channels < 0:
        raise ValueError("missing IHDR")
    if not seen_end:
        raise ValueError("missing IEND")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"decompressed length {len(raw)} != expected {height * (stride + 1)}"
        )
    out = bytearray(height * stride)
    prev = bytes(stride)
    bpp = channels  # bytes per pixel at depth 8
    off = 0
    for y in range(height):
        ft = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        off += 1 + stride
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ValueError(f"unknown scanline filter {ft}")
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return width, height, channels, bytes(out)


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    filter_for_row=None,
) -> bytes:
    """Encode raw row-major samples as a spec-valid PNG. ``filter_for_row``
    maps row index → filter type 0-4 (default all 0); the encoder applies
    the chosen filter exactly, so decoders must implement the full filter
    set to round-trip its output — which is the point for fixtures."""
    if channels not in _COLOR_TYPE:
        raise ValueError(f"channels must be one of {sorted(_COLOR_TYPE)}")
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError(f"pixel length {len(pixels)} != {height}*{stride}")
    bpp = channels
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        ft = int(filter_for_row(y)) if filter_for_row is not None else 0
        if ft == 0:
            enc = bytearray(line)
        elif ft == 1:
            enc = bytearray(
                (line[i] - (line[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:
            enc = bytearray((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:
            enc = bytearray(
                (line[i] - (((line[i - bpp] if i >= bpp else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(stride)
            )
        elif ft == 4:
            enc = bytearray(
                (
                    line[i]
                    - _paeth(
                        line[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        else:
            raise ValueError(f"unknown filter {ft}")
        raw.append(ft)
        raw += enc
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )
