#!/usr/bin/env python3
"""Rewrite a CRAM 3.0 file's block codecs: every block payload is
re-encoded with rANS 4x8 order-1 (rotating in bzip2 and lzma/xz blocks)
while container/block framing, landmarks and CRCs are rebuilt. Produces
an end-to-end fixture for codecs samtools writes by default but the
reference checkout's fixtures never exercise (their blocks are all
raw/gzip/rANS-order-0).

Usage: recompress_cram.py <in.cram> <out.cram> [v31|v31a]

With the `v31` mode the output file definition says version 3.1 and every
sizable block is re-encoded as rANS Nx16 (method 5), rotating through the
codec's transform modes (order-0/1, X32, STRIPE, RLE, PACK where the
alphabet allows, NOSZ) so a single fixture exercises the whole CRAM 3.1
decode surface. `v31a` instead uses the adaptive arithmetic coder
(method 6) for sizable blocks, rotating its modes, and tok3 with
arith-compressed token streams.

Layout parsed per the public CRAM 3.0 spec: 26-byte file definition;
containers = [len i32le, refSeqId/start/span/nRec itf8, counter/bases
ltf8, nBlocks/nLandmarks itf8, landmarks itf8*, crc32] + body of blocks
= [method u8, ctype u8, cid itf8, csize itf8, rawsize itf8, payload,
crc32]. The EOF container (nRec=0, tiny blocks) passes through.
"""
import sys
import zlib
import bz2
import lzma
import gzip

sys.path.insert(0, __import__("os").path.dirname(__file__))
from rans4x8 import compress_o1, decompress_rans, itf8
import arith
import fqzcomp
import ransnx16
import tok3


class In:
    def __init__(self, b, o=0):
        self.b = b
        self.o = o

    def u8(self):
        v = self.b[self.o]
        self.o += 1
        return v

    def bytes(self, n):
        v = self.b[self.o:self.o + n]
        self.o += n
        return v

    def i32le(self):
        v = int.from_bytes(self.b[self.o:self.o + 4], "little", signed=True)
        self.o += 4
        return v

    def itf8(self):
        f = self.u8()
        if f < 0x80:
            return f
        if f < 0xC0:
            return ((f & 0x3F) << 8) | self.u8()
        if f < 0xE0:
            return ((f & 0x1F) << 16) | (self.u8() << 8) | self.u8()
        if f < 0xF0:
            return ((f & 0x0F) << 24) | (self.u8() << 16) | (self.u8() << 8) | self.u8()
        v = ((f & 0x0F) << 28) | (self.u8() << 20) | (self.u8() << 12) | \
            (self.u8() << 4)
        return v | (self.u8() & 0x0F)

    def ltf8(self):
        f = self.u8()
        n = 0
        while n < 8 and ((f << n) & 0x80):
            n += 1
        v = (f & (0xFF >> n)) if n < 8 else 0
        for _ in range(n):
            v = (v << 8) | self.u8()
        return v

    def eof(self):
        return self.o >= len(self.b)


def ltf8_bytes(v):
    # first byte: n leading 1-bits = n trailing bytes, then a 0 separator,
    # then the value's top bits; widen n until the top bits fit.
    if v < 0x80:
        return bytes([v])
    for n in range(1, 8):
        if v < (1 << (7 - n + 8 * n)):
            top = v >> (8 * n)
            prefix = (0xFF << (8 - n)) & 0xFF
            rest = [(v >> (8 * (n - 1 - i))) & 0xFF for i in range(n)]
            return bytes([prefix | top] + rest)
    return bytes([0xFF] + [(v >> (8 * (7 - i))) & 0xFF for i in range(8)])


def decompress(method, payload):
    if method == 0:
        return payload
    if method == 1:
        return gzip.decompress(payload)
    if method == 2:
        return bz2.decompress(payload)
    if method == 3:
        return lzma.decompress(payload)
    if method == 4:
        return decompress_rans(payload)
    raise SystemExit(f"unknown method {method}")


def try_tok3(raw, use_arith=False):
    """tok3-encode a block whose payload is a separator-terminated list of
    printable names (the read-name block shape); None if it isn't one."""
    for sep in (b"\x00", b"\n", b"\t"):
        if not raw.endswith(sep) or raw.count(sep) < 2:
            continue
        names = raw[:-1].split(sep)
        if all(n and all(32 <= c < 127 for c in n) for n in names):
            enc = tok3.encode(raw, sep, use_arith=use_arith)
            assert tok3.decode(enc, sep) == raw
            return enc
    return None


def nx16_encode(raw, rotation):
    """Rotate through Nx16 transform modes; returns (flags-used, stream)."""
    fx = ransnx16
    modes = [0, fx.ORDER1, fx.X32, fx.ORDER1 | fx.X32, fx.RLE,
             fx.ORDER1 | fx.RLE, fx.STRIPE, fx.STRIPE | fx.ORDER1,
             fx.NOSZ, fx.ORDER1 | fx.NOSZ, fx.PACK, fx.ORDER1 | fx.PACK]
    fl = modes[rotation % len(modes)]
    if fl & fx.PACK and len(set(raw)) > 16:
        fl = fx.ORDER1  # alphabet too wide to pack; fall back
    enc = fx.encode(raw, fl)
    dec = fx.decode(enc, known_len=len(raw) if fl & fx.NOSZ else None)
    assert dec == raw, f"nx16 self-check failed for flags {fl}"
    return fl, enc


def try_fqz(raw):
    """fqzcomp-encode a quality-shaped block (small alphabet) as one long
    record — the block's uncompressed form is what CRAM consumes, so the
    internal record segmentation is the codec's own business."""
    if len(raw) >= 64 and max(raw) < 64:
        enc = fqzcomp.encode([raw], params=[fqzcomp.Param()])
        assert fqzcomp.decode(enc, len(raw)) == raw
        return enc
    return None


def arith_encode(raw, rotation):
    """Rotate through arith (method 6) modes; returns (flags-used, stream)."""
    fx = arith
    modes = [0, fx.ORDER1, fx.RLE, fx.ORDER1 | fx.RLE, fx.EXT,
             fx.STRIPE, fx.STRIPE | fx.ORDER1, fx.NOSZ,
             fx.ORDER1 | fx.NOSZ, fx.PACK, fx.ORDER1 | fx.PACK]
    fl = modes[rotation % len(modes)]
    if fl & fx.PACK and len(set(raw)) > 16:
        fl = fx.ORDER1  # alphabet too wide to pack; fall back
    enc = fx.encode(raw, fl)
    dec = fx.decode(enc, len(raw) if fl & fx.NOSZ else -1)
    assert dec == raw, f"arith self-check failed for flags {fl}"
    return fl, enc


def main():
    src, dst = sys.argv[1], sys.argv[2]
    v31 = len(sys.argv) > 3 and sys.argv[3] in ("v31", "v31a")
    use_arith = len(sys.argv) > 3 and sys.argv[3] == "v31a"
    data = open(src, "rb").read()
    r = In(data)
    out = bytearray(r.bytes(26))  # file definition verbatim
    if v31:
        assert out[4] == 3 and out[5] == 0, "expected a CRAM 3.0 input"
        out[5] = 1
    codec_rotation = 0
    while not r.eof():
        cont_start = r.o
        length = r.i32le()
        ref_seq = r.itf8()
        ali_start = r.itf8()
        ali_span = r.itf8()
        n_rec = r.itf8()
        counter = r.ltf8()
        bases = r.ltf8()
        n_blocks = r.itf8()
        n_land = r.itf8()
        landmarks = [r.itf8() for _ in range(n_land)]
        r.bytes(4)  # container crc
        body = In(r.bytes(length))

        if n_rec == 0 and n_blocks <= 1:
            # EOF/empty container: emit the original bytes verbatim
            out += data[cont_start:r.o]
            continue

        new_body = bytearray()
        old_offsets = []  # old offset of each block within body
        new_offsets = []
        while body.o < len(body.b):
            old_offsets.append(body.o)
            new_offsets.append(len(new_body))
            method = body.u8()
            ctype = body.u8()
            cid_start = body.o
            cid = body.itf8()
            cid_bytes = body.b[cid_start:body.o]
            csize = body.itf8()
            rawsize = body.itf8()
            payload = body.bytes(csize)
            body.bytes(4)  # block crc
            raw = decompress(method, payload)
            assert len(raw) == rawsize, f"raw size mismatch {len(raw)} != {rawsize}"
            if rawsize >= 16 and v31 and try_tok3(raw, use_arith) is not None:
                new_method, new_payload = 8, try_tok3(raw, use_arith)
            elif rawsize >= 16 and v31 and use_arith and try_fqz(raw) is not None:
                new_method, new_payload = 7, try_fqz(raw)
            elif rawsize >= 16 and v31 and use_arith:
                codec_rotation += 1
                new_method, (fl, new_payload) = 6, arith_encode(raw, codec_rotation)
            elif rawsize >= 16 and v31:
                codec_rotation += 1
                new_method, (fl, new_payload) = 5, nx16_encode(raw, codec_rotation)
            elif rawsize >= 16:
                codec_rotation += 1
                if codec_rotation % 5 == 0:
                    new_method, new_payload = 2, bz2.compress(raw)
                elif codec_rotation % 5 == 3:
                    new_method, new_payload = 3, lzma.compress(raw, format=lzma.FORMAT_XZ)
                else:
                    new_method, new_payload = 4, compress_o1(raw)
            else:
                new_method, new_payload = 0, raw
            blk = bytes([new_method, ctype]) + cid_bytes + \
                itf8(len(new_payload)) + itf8(rawsize) + new_payload
            blk += zlib.crc32(blk).to_bytes(4, "little")
            new_body += blk

        new_landmarks = []
        for lm in landmarks:
            idx = old_offsets.index(lm)
            new_landmarks.append(new_offsets[idx])

        hdr = itf8(ref_seq if ref_seq >= 0 else (1 << 32) + ref_seq) + \
            itf8(ali_start) + itf8(ali_span) + itf8(n_rec) + \
            ltf8_bytes(counter) + ltf8_bytes(bases) + itf8(n_blocks) + \
            itf8(len(new_landmarks)) + b"".join(itf8(x) for x in new_landmarks)
        cont = len(new_body).to_bytes(4, "little", signed=True) + hdr
        cont += zlib.crc32(cont).to_bytes(4, "little")
        out += cont + new_body

    open(dst, "wb").write(bytes(out))
    print(f"wrote {dst}: {len(out)} bytes (from {len(data)})")


if __name__ == "__main__":
    main()
