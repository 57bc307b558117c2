#!/usr/bin/env python3
"""Independent fixture generator for MultimodalSpec (pure struct-pack, no
image/audio libraries): writes the BMP/WAV/PPM files under this directory
from the published format specs, so the Scala decoder in
graft.pipeline.MediaCodec is validated against the spec rather than against
its own encoder. Deterministic — re-running reproduces the committed bytes
exactly (`python3 gen_fixtures.py && git diff --exit-code .`).

Formats:
 - BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (40-byte), 24bpp bottom-up,
   rows padded to 4-byte stride.  Pixel (x,y): B=40y, G=50x, R=200.
 - WAV: canonical RIFF/WAVE PCM16 mono; the `list` variant inserts a LIST
   chunk with an odd-size payload (plus pad byte) between fmt and data to
   exercise the chunk walk.  Samples are a linear ramp.
 - PPM: concatenated binary P6 frames, maxval 255; frame f pixel-byte i is
   (97*f + 13*i) mod 256.
"""
import struct


def bmp(path, w, h):
    stride = (3 * w + 3) & ~3
    img = bytearray()
    for y in range(h):
        row = bytearray()
        for x in range(w):
            row += bytes(((40 * y) & 0xFF, (50 * x) & 0xFF, 200))
        row += b"\x00" * (stride - 3 * w)
        img += row
    header = struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img),
                       2835, 2835, 0, 0)
    with open(path, "wb") as f:
        f.write(header + info + img)


def wav(path, rate, nframes, base, step, list_chunk=False):
    # linear ramp wrapped into [-amp, amp) so long files stay in int16 range
    amp = -base
    data = b"".join(
        struct.pack("<h", ((base + step * n + amp) % (2 * amp)) - amp)
        for n in range(nframes))
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    extra = b""
    if list_chunk:
        # odd-size ISFT payload ("pytst", 5 bytes) forces a word-align pad
        # on the INNER chunk; the pad byte is part of the LIST payload
        payload = b"INFO" + struct.pack("<4sI", b"ISFT", 5) + b"pytst\x00"
        extra = struct.pack("<4sI", b"LIST", len(payload)) + payload
    body = b"WAVE" + fmt + extra + struct.pack("<4sI", b"data", len(data)) + data
    with open(path, "wb") as f:
        f.write(struct.pack("<4sI", b"RIFF", len(body)) + body)


def ppm(path, w, h, frames):
    out = bytearray()
    for fidx in range(frames):
        out += b"P6\n%d %d\n255\n" % (w, h)
        out += bytes((97 * fidx + 13 * i) & 0xFF for i in range(3 * w * h))
    with open(path, "wb") as f:
        f.write(out)


if __name__ == "__main__":
    import os
    os.chdir(os.path.dirname(os.path.abspath(__file__)))
    bmp("fixture_5x3.bmp", 5, 3)
    wav("fixture_8k_100.wav", 8000, 100, -15000, 317)
    wav("fixture_list_22050_37.wav", 22050, 37, -10000, 911, list_chunk=True)
    ppm("fixture_4x2x3.ppm", 4, 2, 3)
    print("wrote 4 fixtures")
