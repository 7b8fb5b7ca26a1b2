#!/usr/bin/env python3
"""Independent CRAM 3.1 name-tokeniser (tok3) codec written from the
public CRAMcodecs specification — encoder AND decoder, used to produce
known-answer vectors and fixtures for the Scala decoder (which is NOT
derived from this code; the two check each other).

Serialized layout (block method 8):
  ulen   uint32 LE   uncompressed byte length of the name block
  nnames uint32 LE   number of names
  flags  uint8       bit 0: 1 = arith coder, 0 = rANS Nx16

then token streams until EOF, each:
  ttype  uint8       bit7 = first stream of a new token position,
                     bit6 = duplicate of an earlier stream,
                     bits 0-5 = token type (enum below)
  if dup: dup_pos uint8, dup_type uint8
  else:   clen uint7, then clen bytes (rANS Nx16 stream, self-sized)

Token enum: 0 TYPE, 1 ALPHA, 2 CHAR, 3 DIGITS0, 4 DZLEN, 5 DUP,
6 DIFF, 7 DIGITS, 8 DELTA, 9 DELTA0, 10 MATCH, 11 NOP, 12 END.

Per name: B[0][TYPE] says DIFF (with uint32 distance in B[0][DIFF])
or DUP (uint32 distance in B[0][DUP] - verbatim copy). Then for token
positions t=1..: type from B[t][TYPE]; ALPHA = NUL-terminated string
from B[t][ALPHA]; CHAR = 1 byte; DIGITS = uint32 LE rendered decimal;
DIGITS0 = uint32 + pad length byte from B[t][DZLEN]; DELTA/DELTA0 =
uint8 added to the diffed name's value at t; MATCH copies the diffed
name's token; END terminates. Separator bytes ('\\0' or '\\n') are
ordinary CHAR/MATCH tokens, so the byte stream round-trips exactly.
"""
import re
import sys

sys.path.insert(0, __import__("os").path.dirname(__file__))
import arith
import ransnx16

N_TYPE, N_ALPHA, N_CHAR, N_DIGITS0, N_DZLEN, N_DUP, N_DIFF, \
    N_DIGITS, N_DELTA, N_DELTA0, N_MATCH, N_NOP, N_END = range(13)


def tokenize(name):
    """(type, strval, intval) per token; digit runs with a leading zero
    or length > 9 keep their padded form via DIGITS0."""
    toks = []
    for m in re.finditer(rb"[0-9]+|[A-Za-z]+|.|\n", name, re.S):
        s = m.group(0)
        if s[0:1].isdigit():
            v = int(s)
            if v >= 1 << 32 or len(s) > 255:
                # DIGITS/DIGITS0 store u32 values (and DZLEN one pad
                # byte); huge runs (UUID-like ids) go through the ALPHA
                # byte-string stream instead
                toks.append((N_ALPHA, s, None))
            elif (s[0:1] == b"0" and len(s) > 1) or len(s) > 9:
                toks.append((N_DIGITS0, s, v))
            else:
                toks.append((N_DIGITS, s, v))
        elif s[0:1].isalpha():
            toks.append((N_ALPHA, s, None))
        else:
            toks.append((N_CHAR, s, None))
    return toks


def encode(blob, sep=b"\0", implicit_sep=False, use_arith=False):
    """implicit_sep=False: the per-name terminator is an ordinary CHAR
    token. implicit_sep=True: htscodecs' convention — the terminator is
    stripped before tokenising and re-appended by the decoder at N_END
    (ulen still counts it). use_arith compresses the token streams with
    the adaptive arithmetic coder (flags bit 0) instead of rANS Nx16."""
    names = blob.split(sep)
    assert names and names[-1] == b"", "blob must end with the separator"
    names = [n if implicit_sep else n + sep for n in names[:-1]]
    nnames = len(names)
    streams = {}  # (pos, type) -> bytearray

    def put(pos, typ, data):
        streams.setdefault((pos, typ), bytearray()).extend(data)

    tok_lists = []
    recent = {}
    for i, name in enumerate(names):
        if name in recent and i - recent[name] < 65536:
            dist = i - recent[name]
            put(0, N_TYPE, bytes([N_DUP]))
            put(0, N_DUP, dist.to_bytes(4, "little"))
            tok_lists.append(tok_lists[recent[name]])
            continue
        dist = 1 if i > 0 else 0
        prev = tok_lists[i - dist] if i > 0 else []
        put(0, N_TYPE, bytes([N_DIFF]))
        put(0, N_DIFF, dist.to_bytes(4, "little"))
        toks = tokenize(name)
        for t, (typ, s, v) in enumerate(toks, start=1):
            p = prev[t - 1] if t - 1 < len(prev) else None
            if p is not None and p[0] == typ and p[1] == s:
                put(t, N_TYPE, bytes([N_MATCH]))
            elif typ == N_DIGITS and p is not None and p[0] == N_DIGITS and \
                    0 <= v - p[2] <= 255:
                put(t, N_TYPE, bytes([N_DELTA]))
                put(t, N_DELTA, bytes([v - p[2]]))
            elif typ == N_DIGITS0 and p is not None and p[0] == N_DIGITS0 and \
                    len(p[1]) == len(s) and 0 <= v - p[2] <= 255:
                put(t, N_TYPE, bytes([N_DELTA0]))
                put(t, N_DELTA0, bytes([v - p[2]]))
            elif typ == N_ALPHA:
                put(t, N_TYPE, bytes([N_ALPHA]))
                put(t, N_ALPHA, s + b"\0")
            elif typ == N_CHAR:
                put(t, N_TYPE, bytes([N_CHAR]))
                put(t, N_CHAR, s)
            elif typ == N_DIGITS:
                put(t, N_TYPE, bytes([N_DIGITS]))
                put(t, N_DIGITS, v.to_bytes(4, "little"))
            else:
                put(t, N_TYPE, bytes([N_DIGITS0]))
                put(t, N_DIGITS0, v.to_bytes(4, "little"))
                put(t, N_DZLEN, bytes([len(s)]))
        put(len(toks) + 1, N_TYPE, bytes([N_END]))
        tok_lists.append(toks)
        recent[name] = i

    out = bytearray()
    out += len(blob).to_bytes(4, "little")
    out += nnames.to_bytes(4, "little")
    out.append(1 if use_arith else 0)
    max_pos = max(p for p, _ in streams)
    for pos in range(max_pos + 1):
        first = True
        for typ in range(13):
            if (pos, typ) not in streams:
                continue
            raw = bytes(streams[(pos, typ)])
            if use_arith:
                comp = arith.encode(raw, arith.ORDER1 if len(raw) > 64 else 0)
            else:
                fl = ransnx16.ORDER1 if len(raw) > 64 else 0
                comp = ransnx16.encode(raw, fl)
            out.append(typ | (0x80 if first else 0))
            first = False
            out += ransnx16.u7(len(comp))
            out += comp
    return bytes(out)


class _S:
    def __init__(self, b):
        self.b = b
        self.o = 0

    def u8(self):
        v = self.b[self.o]
        self.o += 1
        return v

    def u32(self):
        v = int.from_bytes(self.b[self.o:self.o + 4], "little")
        self.o += 4
        return v

    def cstr(self):
        e = self.b.index(0, self.o)
        v = self.b[self.o:e]
        self.o = e + 1
        return v


def decode(payload, sep=b"\0"):
    src = ransnx16.In(payload)
    ulen = src.u32le()
    nnames = src.u32le()
    use_arith = src.u8()
    assert use_arith in (0, 1), f"bad tok3 flags byte {use_arith}"
    B = {}
    pos = -1
    while src.o < len(payload):
        ttype = src.u8()
        typ = ttype & 0x3F
        if ttype & 0x80:
            pos += 1
        if ttype & 0x40:
            dp, dt = src.u8(), src.u8()
            B[(pos, typ)] = _S(B[(dp, dt)].b)
        else:
            clen = src.u7()
            comp = src.read(clen)
            B[(pos, typ)] = _S(arith.decode(comp) if use_arith
                               else ransnx16.decode(comp))
    names = []
    tok_lists = []
    out = bytearray()
    for i in range(nnames):
        t0 = B[(0, N_TYPE)].u8()
        if t0 == N_DUP:
            dist = B[(0, N_DUP)].u32()
            names.append(names[i - dist])
            tok_lists.append(tok_lists[i - dist])
            out += names[i]
            continue
        assert t0 == N_DIFF
        dist = B[(0, N_DIFF)].u32()
        prev = tok_lists[i - dist] if dist else []
        toks = []
        t = 1
        name = bytearray()
        while True:
            typ = B[(t, N_TYPE)].u8()
            if typ == N_END:
                break
            p = prev[t - 1] if t - 1 < len(prev) else None
            if typ == N_MATCH:
                typ, s, v = p
            elif typ == N_ALPHA:
                s, v = B[(t, N_ALPHA)].cstr(), None
            elif typ == N_CHAR:
                s, v = bytes([B[(t, N_CHAR)].u8()]), None
            elif typ == N_DIGITS:
                v = B[(t, N_DIGITS)].u32()
                s = str(v).encode()
            elif typ == N_DIGITS0:
                v = B[(t, N_DIGITS0)].u32()
                l = B[(t, N_DZLEN)].u8()
                s = str(v).encode().rjust(l, b"0")
            elif typ == N_DELTA:
                v = p[2] + B[(t, N_DELTA)].u8()
                s = str(v).encode()
                typ = N_DIGITS
            elif typ == N_DELTA0:
                v = p[2] + B[(t, N_DELTA0)].u8()
                s = str(v).encode().rjust(len(p[1]), b"0")
                typ = N_DIGITS0
            else:
                raise AssertionError(f"unexpected token type {typ}")
            toks.append((typ, s, v))
            name += s
            t += 1
        names.append(bytes(name))
        tok_lists.append(toks)
        out += name
    if len(out) == ulen:
        return bytes(out)
    # implicit-separator convention: re-append sep after each name
    assert len(out) + nnames == ulen, f"length mismatch {len(out)} != {ulen}"
    return sep.join(names) + sep


def self_test():
    corpora = {
        "illumina": b"".join(
            b"MACHINE:1:FLOW:%d:%d:%d:%d\0" % (i // 100, 1000 + i, 2000 + 3 * i, i % 7)
            for i in range(500)),
        "srr": b"".join(b"SRR1234567.%d\0" % i for i in range(1, 300)),
        "pacbio": b"".join(
            b"m64012_190920_173625/%d/ccs\0" % (i * 17) for i in range(200)),
        "padded": b"".join(b"read%05d\0" % i for i in range(250)),
        "dups": b"a1\0a1\0a1\0b2\0a1\0b2\0" * 40,
        "newline": b"".join(b"chr%d:%d-%d\n" % (i % 23, i * 100, i * 100 + 50)
                            for i in range(100)),
        "single": b"only_one_name.42\0",
    }
    for nm, blob in corpora.items():
        sep = b"\n" if blob.endswith(b"\n") else b"\0"
        enc = encode(blob, sep)
        dec = decode(enc, sep)
        assert dec == blob, f"tok3 roundtrip fail: {nm}"
        # htscodecs-style implicit separator must round-trip too
        enc2 = encode(blob, sep, implicit_sep=True)
        dec2 = decode(enc2, sep)
        assert dec2 == blob, f"tok3 implicit-sep roundtrip fail: {nm}"
        # arith-compressed token streams (flags bit 0)
        enc3 = encode(blob, sep, use_arith=True)
        dec3 = decode(enc3, sep)
        assert dec3 == blob, f"tok3 arith roundtrip fail: {nm}"
        r = len(enc) / len(blob)
        print(f"tok3 {nm}: {len(blob)} -> {len(enc)} ({r:.2f})")
    print("tok3 self-test OK")


if __name__ == "__main__":
    self_test()
