#!/usr/bin/env python3
"""Independent CRAM 3.1 adaptive-arithmetic codec (block method 6) written
from the public CRAMcodecs specification — encoder AND decoder, used to
produce known-answer vectors for the Scala decoder (which is NOT derived
from this code; the two check each other).

Serialized layout (flags mirror rANS Nx16 except bit 2):
  flags  uint8   ORDER1=1, EXT=4 (bzip2 payload), STRIPE=8, NOSZ=16,
                 CAT=32, RLE=64, PACK=128
  ulen   uint7   unless NOSZ
  STRIPE: N uint8, N clen uint7s, N sub-streams (each a full arith stream)
  PACK:   nsym uint8, nsym map bytes, packed-len uint7 (same as Nx16)
  entropy payload: max_sym uint8 (0 = 256), then the range-coded stream

Range coder: carryless Subbotin/Shelwien form (the public fqzcomp /
htscodecs lineage): 32-bit range from 2^32-1, renormalise per byte while
range < 2^24; the encoder defers bytes LZMA-style for carry propagation
and flushes cache+4 bytes, so the decoder primes with 5 bytes.

Adaptive model: freqs start at 1, +16 per hit, halved (rounding up) past
2^16-17, hot symbols bubble one slot toward the front after each update.

RLE: literal from the (order-0/1) byte model, then a run length: first
part under run-model[sym], continuations under run-model[max_sym],
chaining while a part reads 255.
"""
import sys

sys.path.insert(0, __import__("os").path.dirname(__file__))
import bz2

ORDER1, EXT, STRIPE, NOSZ, CAT, RLE, PACK = 1, 4, 8, 16, 32, 64, 128
TOP = 1 << 24
STEP = 16
MAX_FREQ = (1 << 16) - 17


def u7(v):
    out = bytearray()
    started = False
    for sh in (28, 21, 14, 7):
        b = (v >> sh) & 0x7F
        if b or started:
            out.append(b | 0x80)
            started = True
    out.append(v & 0x7F)
    return bytes(out)


class RangeEncoder:
    def __init__(self):
        self.low = 0
        self.range = 0xFFFFFFFF
        self.out = bytearray()
        # cache starts initialised so the first flush emits the placeholder
        # byte the decoder's 5-byte prime discards (carry can bump it to 1)
        self.cache = 0
        self.ff_num = 0

    def _shift_low(self):
        if self.low < 0xFF000000 or self.low >= (1 << 32):
            carry = self.low >> 32
            self.out.append((self.cache + carry) & 0xFF)
            for _ in range(self.ff_num):
                self.out.append((0xFF + carry) & 0xFF)
            self.ff_num = 0
            self.cache = (self.low >> 24) & 0xFF
        else:
            self.ff_num += 1
        self.low = (self.low << 8) & 0xFFFFFFFF

    def encode(self, cum, freq, tot):
        r = self.range // tot
        self.low += cum * r
        self.range = r * freq
        while self.range < TOP:
            self._shift_low()
            self.range <<= 8

    def finish(self):
        for _ in range(5):
            self._shift_low()
        # the first flushed byte is the uninitialised cache placeholder the
        # decoder skips by priming 5 bytes into a 32-bit code
        return bytes(self.out)


class RangeDecoder:
    def __init__(self, b, o=0):
        self.b = b
        self.o = o
        self.range = 0xFFFFFFFF
        self.code = 0
        for _ in range(5):
            self.code = ((self.code << 8) | self.b[self.o]) & 0xFFFFFFFF
            self.o += 1

    def get_freq(self, tot):
        self.range //= tot
        f = self.code // self.range
        return tot - 1 if f >= tot else f

    def decode(self, cum, freq):
        self.code -= cum * self.range
        self.range *= freq
        while self.range < TOP:
            self.range <<= 8
            self.code = (self.code << 8) | self.b[self.o]
            self.o += 1


class Model:
    def __init__(self, nsym):
        self.freq = [1] * nsym
        self.sym = list(range(nsym))
        self.total = nsym

    def _bump(self, i):
        self.freq[i] += STEP
        self.total += STEP
        if self.total > MAX_FREQ:
            self.total = 0
            for j in range(len(self.freq)):
                self.freq[j] -= self.freq[j] >> 1
                self.total += self.freq[j]
        if i > 0 and self.freq[i] > self.freq[i - 1]:
            self.freq[i], self.freq[i - 1] = self.freq[i - 1], self.freq[i]
            self.sym[i], self.sym[i - 1] = self.sym[i - 1], self.sym[i]

    def encode(self, rc, s):
        i = self.sym.index(s)
        cum = sum(self.freq[:i])
        rc.encode(cum, self.freq[i], self.total)
        self._bump(i)

    def decode(self, rc):
        f = rc.get_freq(self.total)
        cum, i = 0, 0
        while cum + self.freq[i] <= f:
            cum += self.freq[i]
            i += 1
        rc.decode(cum, self.freq[i])
        s = self.sym[i]
        self._bump(i)
        return s


def _entropy_encode(data, order1, rle, max_sym):
    rc = RangeEncoder()
    lits = [Model(max_sym) for _ in range(max_sym if order1 else 1)]
    runs = [Model(256) for _ in range(max_sym + 1)] if rle else None
    out = bytearray([max_sym & 0xFF])  # 256 -> 0
    last = 0
    i = 0
    while i < len(data):
        s = data[i]
        lits[last if order1 else 0].encode(rc, s)
        last = s
        i += 1
        if rle:
            run = 0
            while i + run < len(data) and data[i + run] == s:
                run += 1
            i += run
            ctx = s
            while True:
                part = min(run, 255)
                runs[ctx].encode(rc, part)
                run -= part
                ctx = max_sym
                if part != 255:
                    break
    out += rc.finish()
    return bytes(out)


def _entropy_decode(b, n_out, order1, rle):
    max_sym = b[0] or 256
    rc = RangeDecoder(b, 1)
    lits = [Model(max_sym) for _ in range(max_sym if order1 else 1)]
    runs = [Model(256) for _ in range(max_sym + 1)] if rle else None
    out = bytearray()
    last = 0
    while len(out) < n_out:
        s = lits[last if order1 else 0].decode(rc)
        out.append(s)
        last = s
        if rle:
            part = runs[s].decode(rc)
            run = part
            while part == 255:
                part = runs[max_sym].decode(rc)
                run += part
            out += bytes([s]) * run
    return bytes(out)


def _pack(data):
    syms = sorted(set(data))
    n = len(syms)
    if n > 16:
        return None
    if n <= 1:
        return bytes([n]) + bytes(syms), b""
    bits = 1 if n <= 2 else 2 if n <= 4 else 4
    per = 8 // bits
    idx = {s: i for i, s in enumerate(syms)}
    packed = bytearray((len(data) + per - 1) // per)
    for i, s in enumerate(data):
        packed[i // per] |= idx[s] << (bits * (i % per))
    return bytes([n]) + bytes(syms), bytes(packed)


def encode(data, flags):
    out = bytearray([flags])
    if not (flags & NOSZ):
        out += u7(len(data))
    if flags & STRIPE:
        n = 4
        subs = []
        for j in range(n):
            subs.append(encode(data[j::n], flags & ~(STRIPE | NOSZ)))
        out.append(n)
        for s in subs:
            out += u7(len(s))
        for s in subs:
            out += s
        return bytes(out)
    payload = data
    if flags & PACK:
        meta, packed = _pack(data)
        assert meta is not None, "PACK needs <=16 distinct symbols"
        out += meta
        out += u7(len(packed))
        payload = packed
    if flags & CAT:
        out += payload
    elif flags & EXT:
        out += bz2.compress(payload)
    else:
        max_sym = (max(payload) + 1) if payload else 1
        out += _entropy_encode(payload, flags & ORDER1, flags & RLE, max_sym)
    return bytes(out)


class _In:
    def __init__(self, b):
        self.b = b
        self.o = 0

    def u8(self):
        v = self.b[self.o]
        self.o += 1
        return v

    def u7(self):
        v = 0
        while True:
            c = self.u8()
            v = (v << 7) | (c & 0x7F)
            if not c & 0x80:
                return v

    def read(self, n):
        v = self.b[self.o:self.o + n]
        self.o += n
        return v


def decode(payload, known_len=-1):
    src = _In(payload)
    flags = src.u8()
    n_out = known_len if flags & NOSZ else src.u7()
    assert n_out >= 0
    if flags & STRIPE:
        n = src.u8()
        clens = [src.u7() for _ in range(n)]
        parts = [decode(src.read(clens[j]), n_out // n + (1 if n_out % n > j else 0))
                 for j in range(n)]
        out = bytearray(n_out)
        for i in range(n_out):
            out[i] = parts[i % n][i // n]
        return bytes(out)
    out_len = n_out
    pack_syms = None
    if flags & PACK:
        nsym = src.u8()
        pack_syms = src.read(nsym)
        pack_final, out_len = out_len, src.u7()
    if flags & CAT:
        data = src.read(out_len)
    elif flags & EXT:
        data = bz2.decompress(src.b[src.o:])
        assert len(data) == out_len
    else:
        data = _entropy_decode(src.b[src.o:], out_len, flags & ORDER1, flags & RLE)
    if pack_syms is not None:
        n = len(pack_syms)
        if n <= 1:
            data = bytes([pack_syms[0] if n else 0]) * pack_final
        else:
            bits = 1 if n <= 2 else 2 if n <= 4 else 4
            per = 8 // bits
            mask = (1 << bits) - 1
            data = bytes(pack_syms[(data[i // per] >> (bits * (i % per))) & mask]
                         for i in range(pack_final))
    return data


def self_test():
    import zlib
    text = (b"The quick brown fox jumps over the lazy dog. " * 10)
    dna = bytes((zlib.crc32(bytes([(i // 7) % 256])) + i) % 4 + 65
                for i in range(3000))
    quals = bytes(33 + (i * 7 + (i * i) % 13) % 40 for i in range(2500))
    runs = b"".join(bytes([b]) * ((i * 31) % 300 + 1)
                    for i, b in enumerate(b"ABCABDDDA" * 30))
    cases = {
        "o0_text": (text, 0),
        "o1_text": (text, ORDER1),
        "o0_dna": (dna, 0),
        "o1_quals": (quals, ORDER1),
        "cat": (b"xy", CAT),
        "ext_bzip2": (text, EXT),
        "rle_runs": (runs, RLE),
        "o1_rle_runs": (runs, RLE | ORDER1),
        "pack_dna": (dna, PACK),
        "o1_pack_dna": (dna, PACK | ORDER1),
        "pack_rle_runs": (runs[:2000], PACK | RLE),
        "stripe_q": (quals, STRIPE),
        "stripe_o1_q": (quals, STRIPE | ORDER1),
        "nosz_text": (text, NOSZ),
        "o1_nosz_q": (quals, NOSZ | ORDER1),
        "tiny": (b"a", 0),
        "run255": (b"Z" * 1000, RLE),
    }
    for nm, (blob, fl) in cases.items():
        enc = encode(blob, fl)
        dec = decode(enc, len(blob))
        assert dec == blob, f"arith roundtrip fail: {nm}"
        print(f"arith {nm}: flags={fl} {len(blob)} -> {len(enc)}")
    print("arith self-test OK")


if __name__ == "__main__":
    self_test()
