#!/usr/bin/env python3
"""Independent CRAM 3.1 fqzcomp quality codec (block method 7) written
from the public CRAMcodecs specification — encoder AND decoder, used to
produce known-answer vectors for the Scala decoder (which is NOT derived
from this code; the two check each other).

Layout: vers (5), gflags (MULTI_PARAM=1, HAVE_STAB=2, DO_REV=4),
[nparam], [max_sel + stab array], then per parameter set: context u16le,
pflags (DEDUP=2, DO_LEN=4, DO_SEL=8, HAVE_QMAP=16, HAVE_PTAB=32,
HAVE_DTAB=64, HAVE_QTAB=128), max_sym, qbits<<4|qshift, qloc<<4|sloc,
ploc<<4|dloc, [qmap], [qtab], [ptab], [dtab]. Arrays serialise as
literal value bytes where a value equal to its predecessor is followed
by a run byte of extra repeats (255 chains, last resets after a run).

Per record: selector (if max_sel>0), 4-byte LE length via 4 models
(encoded once when lengths are fixed), reverse flag (DO_REV), dedup flag
(DEDUP; 1 = previous record's bytes repeat). Quality context per symbol:
  ctx = (qctx & (2^qbits-1)) << qloc        qctx = (qctx<<qshift)+qtab[q]
      + ptab[min(pos,1023)] << ploc         pos incl. current symbol
      + dtab[min(delta,255)] << dloc        delta = #(q != prevq) so far
      + sel << sloc
starting from the set's initial context each record. Entropy layer =
the same carryless range coder + adaptive models as tools/arith.py.
"""
import sys

sys.path.insert(0, __import__("os").path.dirname(__file__))
from arith import RangeEncoder, RangeDecoder, Model

MULTI_PARAM, HAVE_STAB, DO_REV = 1, 2, 4
PF_DEDUP, PF_DO_LEN, PF_DO_SEL = 2, 4, 8
PF_HAVE_QMAP, PF_HAVE_PTAB, PF_HAVE_DTAB, PF_HAVE_QTAB = 16, 32, 64, 128


def write_array(vals):
    out = bytearray()
    j, last = 0, -1
    while j < len(vals):
        v = vals[j]
        out.append(v)
        j += 1
        if v == last:
            run = 0
            while j < len(vals) and vals[j] == v:
                run += 1
                j += 1
            r = run
            while True:
                out.append(min(r, 255))
                if min(r, 255) != 255:
                    break
                r -= 255
            last = -1
        else:
            last = v
    return bytes(out)


def read_array(src, size):
    out = []
    last = -1
    while len(out) < size:
        v = src.u8()
        out.append(v)
        if v == last:
            extra, r = 0, 255
            while r == 255:
                r = src.u8()
                extra += r
            out += [v] * min(extra, size - len(out))
            last = -1
        else:
            last = v
    return out


class Param:
    def __init__(self, context=0, pflags=0, qbits=8, qshift=5, qloc=0,
                 sloc=14, ploc=8, dloc=12, qmap=None, qtab=None,
                 ptab=None, dtab=None):
        self.context, self.pflags, self.qbits, self.qshift = context, pflags, qbits, qshift
        self.qloc, self.sloc, self.ploc, self.dloc = qloc, sloc, ploc, dloc
        self.qmap = qmap
        self.qtab = qtab or list(range(256))
        self.ptab, self.dtab = ptab, dtab
        if qmap:
            self.pflags |= PF_HAVE_QMAP
        if qtab:
            self.pflags |= PF_HAVE_QTAB
        if ptab:
            self.pflags |= PF_HAVE_PTAB
        if dtab:
            self.pflags |= PF_HAVE_DTAB

    def max_sym(self):
        return len(self.qmap) if self.qmap else 64

    def serialize(self):
        out = bytearray()
        out += self.context.to_bytes(2, "little")
        out.append(self.pflags)
        out.append(self.max_sym())
        out.append((self.qbits << 4) | self.qshift)
        out.append((self.qloc << 4) | self.sloc)
        out.append((self.ploc << 4) | self.dloc)
        if self.pflags & PF_HAVE_QMAP:
            out += bytes(self.qmap)
        if self.pflags & PF_HAVE_QTAB:
            out += write_array(self.qtab)
        if self.pflags & PF_HAVE_PTAB:
            out += write_array(self.ptab)
        if self.pflags & PF_HAVE_DTAB:
            out += write_array(self.dtab)
        return bytes(out)


class _Coder:
    """Shared encode/decode state machine; `enc` drives which side runs."""

    def __init__(self, params, gflags, stab, max_sel):
        self.params, self.gflags, self.stab, self.max_sel = params, gflags, stab, max_sel
        max_sym = max(p.max_sym() for p in params)
        self.qual = {}
        self.max_sym = max_sym
        self.lens = [Model(256) for _ in range(4)]
        self.sel_m = Model(max_sel + 1)
        self.rev_m = Model(2)
        self.dup_m = Model(2)

    def qual_model(self, ctx):
        if ctx not in self.qual:
            self.qual[ctx] = Model(self.max_sym)
        return self.qual[ctx]


def encode(records, params, sels=None, revs=None, gflags=0, stab=None,
           max_sel=None, fixed_len=False):
    """records: list of per-record quality byte strings. sels: per-record
    parameter selector (enables MULTI_PARAM); revs: per-record reverse
    flags (enables DO_REV). fixed_len encodes the length once."""
    multi = sels is not None
    if multi:
        gflags |= MULTI_PARAM
    if revs is not None:
        gflags |= DO_REV
    if stab is not None:
        gflags |= HAVE_STAB
    if max_sel is None:
        max_sel = (len(params) - 1) if multi else 0
    stab_full = stab or [min(i, len(params) - 1) for i in range(256)]

    out = bytearray([5, gflags])
    if gflags & MULTI_PARAM:
        out.append(len(params))
    if gflags & HAVE_STAB:
        out.append(max_sel)
        out += write_array(stab_full)
    for p in params:
        if fixed_len:
            p.pflags &= ~PF_DO_LEN
        else:
            p.pflags |= PF_DO_LEN
    for p in params:
        out += p.serialize()

    rc = RangeEncoder()
    C = _Coder(params, gflags, stab_full, max_sel)
    first = True
    prev_rec = None
    for r, rec in enumerate(records):
        sel = (sels[r] if sels else 0)
        if max_sel > 0:
            C.sel_m.encode(rc, sel)
        p = params[stab_full[sel]]
        if first or (p.pflags & PF_DO_LEN):
            ln = len(rec)
            for b in range(4):
                C.lens[b].encode(rc, (ln >> (8 * b)) & 0xFF)
        first = False
        if gflags & DO_REV:
            C.rev_m.encode(rc, 1 if revs[r] else 0)
        data = rec[::-1] if (revs and revs[r]) else rec
        if p.pflags & PF_DEDUP:
            dup = 1 if data == prev_rec else 0
            C.dup_m.encode(rc, dup)
            if dup:
                prev_rec = data
                continue
        prev_rec = data
        inv_qmap = ({q: i for i, q in enumerate(p.qmap)}
                    if p.pflags & PF_HAVE_QMAP else None)
        qctx, prevq, delta = 0, 0, 0
        ctx = p.context
        pos = len(data)
        for byte in data:
            q = inv_qmap[byte] if inv_qmap else byte
            C.qual_model(ctx).encode(rc, q)
            qctx = (qctx << p.qshift) + p.qtab[q]
            c = (qctx & ((1 << p.qbits) - 1)) << p.qloc
            if p.pflags & PF_HAVE_PTAB:
                c += p.ptab[min(pos, 1023)] << p.ploc
            if p.pflags & PF_HAVE_DTAB:
                c += p.dtab[min(delta, 255)] << p.dloc
            if p.pflags & PF_DO_SEL:
                c += sel << p.sloc
            ctx = c & 0xFFFF
            delta += prevq != q
            prevq = q
            pos -= 1
        # note: the per-symbol ptab position includes the current symbol
    out += rc.finish()
    return bytes(out)


class _In:
    def __init__(self, b, o=0):
        self.b, self.o = b, o

    def u8(self):
        v = self.b[self.o]
        self.o += 1
        return v


def decode(payload, known_len):
    src = _In(payload)
    vers = src.u8()
    assert vers == 5, f"fqzcomp version {vers}"
    gflags = src.u8()
    nparam = src.u8() if gflags & MULTI_PARAM else 1
    max_sel = nparam - 1 if nparam > 1 else 0
    if gflags & HAVE_STAB:
        max_sel = src.u8()
        stab = read_array(src, 256)
    else:
        stab = [min(i, nparam - 1) for i in range(256)]
    params = []
    for _ in range(nparam):
        context = src.u8() | (src.u8() << 8)
        pflags = src.u8()
        max_sym = src.u8()
        x = src.u8(); qbits, qshift = x >> 4, x & 15
        x = src.u8(); qloc, sloc = x >> 4, x & 15
        x = src.u8(); ploc, dloc = x >> 4, x & 15
        qmap = [src.u8() for _ in range(max_sym)] if pflags & PF_HAVE_QMAP else None
        qtab = read_array(src, 256) if pflags & PF_HAVE_QTAB else list(range(256))
        ptab = read_array(src, 1024) if pflags & PF_HAVE_PTAB else None
        dtab = read_array(src, 256) if pflags & PF_HAVE_DTAB else None
        p = Param(context, 0, qbits, qshift, qloc, sloc, ploc, dloc)
        p.pflags, p.qmap, p.qtab, p.ptab, p.dtab = pflags, qmap, qtab, ptab, dtab
        params.append(p)

    rc = RangeDecoder(payload, src.o)
    C = _Coder(params, gflags, stab, max_sel)
    out = bytearray()
    rev_ranges = []
    first = True
    last_len = -1
    while len(out) < known_len:
        sel = C.sel_m.decode(rc) if max_sel > 0 else 0
        p = params[stab[sel]]
        if first or (p.pflags & PF_DO_LEN):
            ln = sum(C.lens[b].decode(rc) << (8 * b) for b in range(4))
            last_len = ln
        else:
            ln = last_len
        first = False
        assert 0 < ln <= known_len - len(out), f"bad record length {ln}"
        rev = (gflags & DO_REV) and C.rev_m.decode(rc) == 1
        if rev:
            rev_ranges.append((len(out), ln))
        if (p.pflags & PF_DEDUP) and C.dup_m.decode(rc) == 1:
            out += out[-ln:]
            continue
        qctx, prevq, delta = 0, 0, 0
        ctx = p.context
        pos = ln
        for _ in range(ln):
            q = C.qual_model(ctx).decode(rc)
            out.append(p.qmap[q] if p.qmap else q)
            qctx = (qctx << p.qshift) + p.qtab[q]
            c = (qctx & ((1 << p.qbits) - 1)) << p.qloc
            if p.pflags & PF_HAVE_PTAB:
                c += p.ptab[min(pos, 1023)] << p.ploc
            if p.pflags & PF_HAVE_DTAB:
                c += p.dtab[min(delta, 255)] << p.dloc
            if p.pflags & PF_DO_SEL:
                c += sel << p.sloc
            ctx = c & 0xFFFF
            delta += prevq != q
            prevq = q
            pos -= 1
    for start, ln in rev_ranges:
        out[start:start + ln] = out[start:start + ln][::-1]
    return bytes(out)


def gen_ptab(nbits, size=1024):
    """A step table like real encoders use: coarse position buckets."""
    return [min((i.bit_length() if i else 0), (1 << nbits) - 1)
            for i in range(size)]


def self_test():
    import random
    rnd = random.Random(42)

    def mkrec(n, span=40):
        q, out = 20, []
        for _ in range(n):
            q = max(0, min(span - 1, q + rnd.choice([-2, -1, -1, 0, 0, 0, 1, 1, 2])))
            out.append(q)
        return bytes(out)

    recs = [mkrec(100) for _ in range(50)]
    varlen = [mkrec(30 + (i * 13) % 120) for i in range(40)]
    longrec = [mkrec(2000)]

    cases = []
    cases.append(("basic", recs, dict(params=[Param()], fixed_len=True)))
    cases.append(("varlen", varlen, dict(params=[Param()])))
    cases.append(("single_long", longrec, dict(params=[Param()])))
    cases.append(("qmap", recs,
                  dict(params=[Param(qmap=sorted(set(b for r in recs for b in r)))],
                       fixed_len=True)))
    cases.append(("ptab_dtab", recs,
                  dict(params=[Param(qbits=6, qshift=3, ploc=6, dloc=10,
                                     ptab=gen_ptab(4), dtab=gen_ptab(4, 256))],
                       fixed_len=True)))
    cases.append(("qtab", recs,
                  dict(params=[Param(qtab=[min(i // 4, 255) for i in range(256)])],
                       fixed_len=True)))
    dup = [recs[0], recs[0], recs[1], recs[1], recs[1], recs[2]]
    cases.append(("dedup", dup,
                  dict(params=[Param(pflags=PF_DEDUP)], fixed_len=True)))
    sels = [i % 2 for i in range(len(recs))]
    cases.append(("multi_param", recs,
                  dict(params=[Param(), Param(qbits=6, qshift=3, pflags=PF_DO_SEL,
                                              sloc=12)],
                       sels=sels, fixed_len=True)))
    cases.append(("stab", recs,
                  dict(params=[Param(), Param(qbits=4, qshift=2)],
                       sels=[i % 4 for i in range(len(recs))], max_sel=3,
                       stab=[0, 0, 1, 1] + [1] * 252, fixed_len=True)))
    revs = [i % 3 == 0 for i in range(len(recs))]
    cases.append(("do_rev", recs, dict(params=[Param()], revs=revs, fixed_len=True)))

    for nm, rs, kw in cases:
        enc = encode(rs, **kw)
        blob = b"".join(rs)
        dec = decode(enc, len(blob))
        assert dec == blob, f"fqzcomp roundtrip fail: {nm}"
        print(f"fqz {nm}: {len(blob)} -> {len(enc)} ({len(enc)/len(blob):.2f})")
    print("fqzcomp self-test OK")


if __name__ == "__main__":
    self_test()
