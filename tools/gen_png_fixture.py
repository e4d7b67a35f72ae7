#!/usr/bin/env python3
"""Generate the committed PNG fixtures (fixtures/media/*.png).

Layout is CANONICAL on purpose: 8-bit RGB (color type 2), filter 0 on
every row, ONE IDAT chunk whose zlib stream is a single STORED
(uncompressed) deflate block. Stored blocks are a fully valid zlib
mode — the engine still decodes them through java.util.zip.Inflater —
and they keep every scanline byte visible at a closed-form offset, so
the DuckDB oracle can re-decode pixel CONTENT from read_blob hex with
no codec library (the same trick as the .p6v clip oracle). Dynamic-
Huffman compression and filters 1-4 are exercised in MediaCodecsSpec
against java.util.zip.Deflater-encoded images instead, where a second
SQL decoder is impossible.

One deliberately-unsupported file (color type 6, RGBA) exercises the
unsupported-subtype fallback in BOTH decoders.

Rerunning is byte-stable (seed math only, no randomness).
"""
import struct
import zlib
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "fixtures" / "media"
OUT.mkdir(parents=True, exist_ok=True)


def chunk(typ, data):
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def stored_zlib(raw):
    """zlib container with one stored deflate block (raw <= 65535)."""
    assert len(raw) <= 65535
    return (b"\x78\x01"                      # zlib header, no preset dict
            + b"\x01"                        # BFINAL=1, BTYPE=00 (stored)
            + struct.pack("<HH", len(raw), len(raw) ^ 0xFFFF)
            + raw
            + struct.pack(">I", zlib.adler32(raw)))


def raster(w, h):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(((x * 11 + y * 17) % 256, (x * 5 + 3) % 256,
                         (y * 7 + 1) % 256))
    return bytes(px)


def png_rgb(w, h):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    rows = raster(w, h)
    scan = b"".join(b"\x00" + rows[y * w * 3:(y + 1) * w * 3]
                    for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", stored_zlib(scan)) + chunk(b"IEND", b""))


def png_rgba_unsupported(w, h):
    """Color type 6 (RGBA): valid PNG, unsupported subtype for the
    8-bit-RGB decoder — must degrade row-wise in both engines."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    rows = bytearray()
    for y in range(h):
        rows += b"\x00"
        for x in range(w):
            rows += bytes(((x * 11 + y) % 256, (x * 5) % 256,
                           (y * 7) % 256, 128))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", stored_zlib(bytes(rows))) + chunk(b"IEND", b""))


files = {
    "img_6x4.png": png_rgb(6, 4),
    "img_9x5.png": png_rgb(9, 5),
    "img_16x8.png": png_rgb(16, 8),
    "img_rgba_7x3.png": png_rgba_unsupported(7, 3),
}
for name, payload in files.items():
    (OUT / name).write_bytes(payload)
    print(f"wrote {OUT/name}: {len(payload)} bytes")
