#!/usr/bin/env python3
"""Independent pin for l67_image_neardup / ImageOpsSpec.

Decodes PNG files with a from-scratch pure-stdlib reader (zlib inflate +
PNG filter reconstruction per the PNG 1.2 spec, truecolor-8 only — exactly
what ImageOps.neardupPng/synthPng emit) and computes the 9x8 dHash by the
same published recipe ImageOps.dHash implements. No shared code with the
Scala side: if ImageIO mis-decoded (or the Scala decode were a stub), the
hashes pinned in ImageOpsSpec would not match.

Usage:
  python3 tools/pin_l67.py <dir-with-id.png-files>     # prints "id hi lo"
"""
import glob
import os
import struct
import sys
import zlib


def decode_png(data):
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    width = height = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bitdepth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            assert bitdepth == 8 and color == 2, "expected truecolor-8"
            assert comp == 0 and filt == 0 and interlace == 0
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    bpp = 3
    stride = width * bpp
    out = bytearray(height * stride)
    p = 0
    for y in range(height):
        ft = raw[p]
        p += 1
        line = raw[p:p + stride]
        p += stride
        prev = out[(y - 1) * stride:y * stride] if y > 0 else bytes(stride)
        cur = out
        base = y * stride
        for i in range(stride):
            a = cur[base + i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            x = line[i]
            if ft == 0:
                v = x
            elif ft == 1:
                v = (x + a) & 0xFF
            elif ft == 2:
                v = (x + b) & 0xFF
            elif ft == 3:
                v = (x + (a + b) // 2) & 0xFF
            elif ft == 4:  # Paeth
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = (x + pred) & 0xFF
            else:
                raise ValueError(f"filter {ft}")
            cur[base + i] = v
    px = [[(out[y * stride + 3 * x], out[y * stride + 3 * x + 1],
            out[y * stride + 3 * x + 2]) for x in range(width)]
          for y in range(height)]
    return width, height, px


def dhash(width, height, px):
    cells = [[0] * 9 for _ in range(8)]
    for cy in range(8):
        y0, y1 = cy * height // 8, (cy + 1) * height // 8
        for cx in range(9):
            x0, x1 = cx * width // 9, (cx + 1) * width // 9
            s = n = 0
            for y in range(y0, y1):
                for x in range(x0, x1):
                    r, g, b = px[y][x]
                    s += (299 * r + 587 * g + 114 * b) // 1000
                    n += 1
            cells[cy][cx] = s // n if n else 0
    h = 0
    for cy in range(8):
        for cx in range(8):
            if cells[cy][cx] < cells[cy][cx + 1]:
                h |= 1 << (cy * 8 + cx)
    return h >> 32, h & 0xFFFFFFFF


def main(d):
    for f in sorted(glob.glob(os.path.join(d, "*.png")),
                    key=lambda p: int(os.path.basename(p)[:-4])):
        doc_id = int(os.path.basename(f)[:-4])
        with open(f, "rb") as fh:
            w, h, px = decode_png(fh.read())
        hi, lo = dhash(w, h, px)
        print(doc_id, hi, lo)


if __name__ == "__main__":
    main(sys.argv[1])
