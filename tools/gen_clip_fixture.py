#!/usr/bin/env python3
"""Generate the committed P6 clip-stream fixtures (fixtures/media/*.p6v).

A .p6v clip is back-to-back same-dimension binary P6 frames — the
no-codec stand-in for a video container (this environment ships no
image/video libs, so the engine's clip operators parse this trivial
but real multi-frame layout). Pixel bytes are a deterministic
function of (frame, x, y) so the judged frame-sample query's channel
sums are reproducible from first principles by the DuckDB oracle.
"""
import os

HERE = os.path.dirname(os.path.abspath(__file__))
MEDIA = os.path.join(HERE, "..", "fixtures", "media")


def clip(name, w, h, n_frames):
    path = os.path.join(MEDIA, name)
    with open(path, "wb") as f:
        for fr in range(n_frames):
            f.write(f"P6\n{w} {h}\n255\n".encode("ascii"))
            raster = bytearray()
            for y in range(h):
                for x in range(w):
                    raster.append((fr * 29 + x * 7 + y * 3) % 256)
                    raster.append((fr * 31 + x * 5 + y * 11) % 256)
                    raster.append((fr * 37 + x * 13 + y) % 256)
            f.write(bytes(raster))
    print(f"wrote {path}: {w}x{h}, {n_frames} frames,"
          f" {os.path.getsize(path)} bytes")


if __name__ == "__main__":
    clip("clip_6x4_8f.p6v", 6, 4, 8)
    clip("clip_3x2_5f.p6v", 3, 2, 5)
