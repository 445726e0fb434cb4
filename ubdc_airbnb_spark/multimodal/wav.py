"""Pure-stdlib WAV (RIFF PCM) codec: the real audio-decode kernel for the
multimodal pipeline — PCM needs no external audio library, only struct
parsing, so the decode stage runs anywhere Python does.

Scope (raises ValueError outside it): RIFF/WAVE containers with an
uncompressed PCM ``fmt `` chunk (format tag 1), 8- or 16-bit samples,
any channel count/sample rate, ``data`` chunk required. Compressed
formats (MP3/AAC/float PCM/extensible) are rejected loudly — the same
fail-closed contract as the PNG decoder: a silently misdecoded clip
poisons features downstream.

The encoder exists for fixtures and tests (spec-valid RIFF output).
"""

from __future__ import annotations

import struct


def decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a WAV byte string → (sample_rate, channels, bits, samples)
    with ``samples`` the interleaved integer samples (signed for 16-bit,
    unsigned 0-255 for 8-bit, per the RIFF spec)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if length < 16:
                raise ValueError("fmt chunk too short")
            tag, channels, rate, _brate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag != 1:
                raise ValueError(f"unsupported WAV format tag {tag} (PCM only)")
            if bits not in (8, 16):
                raise ValueError(f"unsupported bit depth {bits} (8/16)")
            if channels == 0:
                raise ValueError("zero channels")
            fmt = (rate, channels, bits)
        elif cid == b"data":
            raw = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("missing fmt chunk")
    if raw is None:
        raise ValueError("missing data chunk")
    rate, channels, bits = fmt
    if bits == 8:
        samples = list(raw)
    else:
        if len(raw) % 2:
            raise ValueError("odd data length for 16-bit samples")
        samples = list(struct.unpack(f"<{len(raw) // 2}h", raw))
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channel count")
    return rate, channels, bits, samples


def encode_wav(
    samples: list[int], sample_rate: int = 8000, channels: int = 1, bits: int = 16
) -> bytes:
    """Encode interleaved integer samples as a spec-valid PCM WAV."""
    if bits == 8:
        if any(s < 0 or s > 255 for s in samples):
            raise ValueError("8-bit samples must be 0..255")
        raw = bytes(samples)
    elif bits == 16:
        raw = struct.pack(f"<{len(samples)}h", *samples)
    else:
        raise ValueError("bits must be 8 or 16")
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channel count")
    align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, sample_rate * align, align, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw + (b"\x00" if len(raw) & 1 else b"")
    return b"RIFF" + struct.pack("<I", len(body)) + body
