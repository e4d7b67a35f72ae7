#!/usr/bin/env python3
"""Deterministic generator for fixtures/media/ — real media payloads
for the multimodal decode operators, in formats whose containers are
pure byte arithmetic (no codec library needed to parse them):

- P6 PPM images (binary RGB, ASCII header): deterministic gradient
  rasters at several sizes;
- 24-bit uncompressed (BI_RGB) BMP images: same gradient, but with
  the format's bottom-up row order and 4-byte row padding;
- PCM WAV audio (RIFF header + raw samples): deterministic sine-ish
  integer waveforms, mono and stereo;
- one .bin file to exercise the unsupported-format fallback.

The engine's decode of THESE is real (header parse + raster/sample
math); compressed codecs (jpeg/png/mp3) remain stubbed because the
container ships no codec libs. Rerunning is byte-stable (seed math
only, no randomness).
"""
import math
import struct
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "fixtures" / "media"
OUT.mkdir(parents=True, exist_ok=True)


def ppm(w, h):
    header = f"P6\n{w} {h}\n255\n".encode()
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(((x * 7 + y * 13) % 256, (x * 3) % 256, (y * 5) % 256))
    return header + bytes(px)


def bmp(w, h):
    """24-bit BI_RGB: BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40),
    bottom-up rows padded to 4 bytes, BGR pixel order."""
    row_size = (w * 3 + 3) // 4 * 4
    data = bytearray()
    for y in range(h - 1, -1, -1):
        row = bytearray()
        for x in range(w):
            row += bytes(((y * 5) % 256, (x * 3) % 256, (x * 7 + y * 13) % 256))
        row += b"\x00" * (row_size - len(row))
        data += row
    pixel_offset = 14 + 40
    hdr = (b"BM" + struct.pack("<IHHI", pixel_offset + len(data), 0, 0, pixel_offset)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                         2835, 2835, 0, 0))
    return hdr + bytes(data)


def wav(channels, rate, n_samples, freq):
    data = bytearray()
    for i in range(n_samples):
        for c in range(channels):
            v = int(12000 * math.sin(2 * math.pi * freq * (c + 1) * i / rate))
            data += struct.pack("<h", v)
    byte_rate = rate * channels * 2
    block_align = channels * 2
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                   byte_rate, block_align, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + bytes(data)


files = {
    "img_8x5.ppm": ppm(8, 5),
    "img_16x16.ppm": ppm(16, 16),
    "img_64x3.ppm": ppm(64, 3),
    "img_10x7.bmp": bmp(10, 7),
    "img_5x5.bmp": bmp(5, 5),   # 15-byte rows -> 1 pad byte each
    "tone_mono_8k.wav": wav(1, 8000, 4000, 440.0),    # 0.5 s mono
    "tone_stereo_4k.wav": wav(2, 4000, 1000, 220.0),  # 0.25 s stereo
    "opaque.bin": bytes(range(256)) * 4,
}
for name, payload in files.items():
    (OUT / name).write_bytes(payload)
    print(f"wrote {OUT/name}: {len(payload)} bytes")
