#!/usr/bin/env python3
"""Independent rANS Nx16 codec (CRAM 3.1) written from the public
CRAMcodecs specification (samtools/hts-specs CRAMcodecs.pdf) — encoder
AND decoder, used to produce known-answer vectors and CRAM 3.1 fixtures
for the Scala decoder. Deliberately NOT derived from the Scala code so
the two implementations check each other.

Stream layout (first byte = flags):
  0x01 ORDER1   order-1 entropy coding (context = previous byte)
  0x04 X32      32-way state interleave (default 4)
  0x08 STRIPE   transpose into N sub-streams, each its own Nx16 stream
  0x10 NOSZ     uncompressed size not stored (caller supplies it)
  0x20 CAT      payload stored raw
  0x40 RLE      run-length transform before entropy stage
  0x80 PACK     bit-pack (<=16 distinct symbols) before RLE/entropy

Decode pipeline: flags, [len u7], stripe? else: pack-meta?, rle-meta?,
entropy (cat/order0/order1), then un-RLE, then un-pack.  rANS states
renormalise 16 bits at a time against a 2^15 lower bound; order-0
frequencies normalise to 2^12, order-1 rows to 2^shift (12 or 10, high
nibble of the table's leading byte; low bit = table itself order-0
compressed). Alphabets use the ascending +1-run encoding; uint7 is
big-endian base-128 with a continuation MSB.
"""
import sys

RANS_L = 1 << 15

ORDER1, X32, STRIPE, NOSZ, CAT, RLE, PACK = 1, 4, 8, 16, 32, 64, 128


class In:
    def __init__(self, b, o=0):
        self.b = b
        self.o = o

    def u8(self):
        v = self.b[self.o]
        self.o += 1
        return v

    def u16le(self):
        v = self.b[self.o] | (self.b[self.o + 1] << 8)
        self.o += 2
        return v

    def u32le(self):
        v = int.from_bytes(self.b[self.o:self.o + 4], "little")
        self.o += 4
        return v

    def u7(self):
        v = 0
        while True:
            c = self.u8()
            v = (v << 7) | (c & 0x7F)
            if not (c & 0x80):
                return v

    def read(self, n):
        v = self.b[self.o:self.o + n]
        self.o += n
        return v


def u7(v):
    out = [v & 0x7F]
    v >>= 7
    while v:
        out.append(0x80 | (v & 0x7F))
        v >>= 7
    return bytes(reversed(out))


def normalise(F, bits):
    """Scale a 256-entry freq table to sum exactly 2^bits; nonzero
    entries stay nonzero; the largest entry absorbs the residue."""
    tot = 1 << bits
    t = sum(F)
    if t == 0:
        return F
    M = max(range(256), key=lambda s: F[s])
    acc = 0
    for s in range(256):
        if F[s]:
            F[s] = max(1, F[s] * tot // t)
            acc += F[s]
    F[M] += tot - acc
    assert F[M] > 0, "normalise: max symbol underflow"
    return F


def write_alphabet(F):
    """Ascending symbol list; sym==prev+1 starts a run whose length byte
    counts the further consecutive symbols."""
    A = [s for s in range(256) if F[s]]
    out = bytearray()
    i = 0
    while i < len(A):
        out.append(A[i])
        if i > 0 and A[i] == A[i - 1] + 1:
            run = 0
            while i + run + 1 < len(A) and A[i + run + 1] == A[i + run] + 1:
                run += 1
            out.append(run)
            for k in range(run):
                pass  # symbols in the run are implicit
            i += run + 1
        else:
            i += 1
    out.append(0)
    return A, bytes(out)


def read_alphabet(src):
    A = []
    rle = 0
    sym = src.u8()
    last = sym
    while True:
        A.append(sym)
        if rle > 0:
            rle -= 1
            sym += 1
        else:
            sym = src.u8()
            if sym == last + 1:
                rle = src.u8()
        last = sym
        if sym == 0:
            break
    return A


# ---- raw order-0 (no flag byte; used for the main stream and for
# ---- compressed order-1 tables / RLE metadata) ----

def rans0_encode(data, N, bits=12):
    F = [0] * 256
    for b in data:
        F[b] += 1
    normalise(F, bits)
    A, alpha = write_alphabet(F)
    table = bytearray(alpha)
    for s in A:
        table += u7(F[s])
    C = [0] * 257
    for s in range(256):
        C[s + 1] = C[s] + F[s]
    R = [RANS_L] * N
    words = []
    for i in range(len(data) - 1, -1, -1):
        j = i % N
        s = data[i]
        f = F[s]
        x_max = ((RANS_L >> bits) << 16) * f
        while R[j] >= x_max:
            words.append(R[j] & 0xFFFF)
            R[j] >>= 16
        R[j] = ((R[j] // f) << bits) + (R[j] % f) + C[s]
    out = bytearray(table)
    for j in range(N):
        out += R[j].to_bytes(4, "little")
    for w in reversed(words):
        out += w.to_bytes(2, "little")
    return bytes(out)


def rans0_decode(src, n_out, N, bits=12):
    if n_out == 0:
        return b""
    A = read_alphabet(src)
    F = [0] * 256
    for s in A:
        F[s] = src.u7()
    normalise(F, bits)
    C = [0] * 257
    for s in range(256):
        C[s + 1] = C[s] + F[s]
    lut = bytearray(1 << bits)
    for s in A:
        for f in range(C[s], C[s + 1]):
            lut[f] = s
    mask = (1 << bits) - 1
    R = [src.u32le() for _ in range(N)]
    out = bytearray(n_out)
    for i in range(n_out):
        j = i % N
        f = R[j] & mask
        s = lut[f]
        out[i] = s
        R[j] = F[s] * (R[j] >> bits) + f - C[s]
        if R[j] < RANS_L:
            R[j] = (R[j] << 16) | src.u16le()
    return bytes(out)


# ---- order-1 ----

def rans1_encode(data, N, shift=12, comp_table=False):
    n = len(data)
    F = [[0] * 256 for _ in range(256)]
    C = [[0] * 257 for _ in range(256)]
    chunk = n // N
    # context 0 opens each chunk (and the whole stream)
    for j in range(N):
        if chunk or j == N - 1:
            pass
    starts = [j * chunk for j in range(N)]
    for j in range(N):
        if starts[j] < n:
            F[0][data[starts[j]]] += 1
    for i in range(1, n):
        if i in starts[1:]:
            continue
        F[data[i - 1]][data[i]] += 1
    # normalise rows, write table over the union alphabet
    union = [0] * 256
    for i in range(256):
        for j in range(256):
            if F[i][j]:
                union[i] = 1
                union[j] = 1
    A, alpha = write_alphabet(union)
    for i in A:
        if sum(F[i]):
            normalise(F[i], shift)
        for s in range(256):
            C[i][s + 1] = C[i][s] + F[i][s]
    table = bytearray(alpha)
    for i in A:
        run = 0
        for j in A:
            if run > 0:
                run -= 1
                continue
            table += u7(F[i][j])
            if F[i][j] == 0:
                z = 0
                ji = A.index(j)
                while ji + z + 1 < len(A) and F[i][A[ji + z + 1]] == 0:
                    z += 1
                table.append(z)
                run = z
    head = bytearray()
    if comp_table:
        comp = rans0_encode(bytes(table), 4, 12)
        if len(comp) < len(table):
            head.append((shift << 4) | 1)
            head += u7(len(table))
            head += u7(len(comp))
            head += comp
        else:
            comp_table = False
    if not comp_table:
        head.append(shift << 4)
        head += table
    # encode in reverse of the decode schedule
    R = [RANS_L] * N
    words = []

    def enc(j, ctx, s):
        f = F[ctx][s]
        x_max = ((RANS_L >> shift) << 16) * f
        while R[j] >= x_max:
            words.append(R[j] & 0xFFFF)
            R[j] >>= 16
        R[j] = ((R[j] // f) << shift) + (R[j] % f) + C[ctx][s]

    # tail (positions N*chunk .. n-1) decoded last by state N-1
    for i in range(n - 1, N * chunk - 1, -1):
        enc(N - 1, data[i - 1] if i > 0 else 0, data[i])
    # main: decode order is k ascending, j ascending; reverse it
    for k in range(chunk - 1, -1, -1):
        for j in range(N - 1, -1, -1):
            i = j * chunk + k
            ctx = data[i - 1] if k > 0 else 0
            enc(j, ctx, data[i])
    out = bytearray(head)
    for j in range(N):
        out += R[j].to_bytes(4, "little")
    for w in reversed(words):
        out += w.to_bytes(2, "little")
    return bytes(out)


def rans1_decode(src, n_out, N):
    if n_out == 0:
        return b""
    comp = src.u8()
    shift = comp >> 4
    if comp & 1:
        u_len = src.u7()
        c_len = src.u7()
        src2 = In(rans0_decode(In(src.read(c_len)), u_len, 4, 12))
    else:
        src2 = src
    A = read_alphabet(src2)
    F = [[0] * 256 for _ in range(256)]
    C = [[0] * 257 for _ in range(256)]
    for i in A:
        run = 0
        for j in A:
            if run > 0:
                run -= 1
                continue
            F[i][j] = src2.u7()
            if F[i][j] == 0:
                run = src2.u8()
        if sum(F[i]):
            normalise(F[i], shift)
        for s in range(256):
            C[i][s + 1] = C[i][s] + F[i][s]
    mask = (1 << shift) - 1
    lut = {}
    for i in A:
        row = bytearray(1 << shift)
        for s in A:
            for f in range(C[i][s], C[i][s + 1]):
                row[f] = s
        lut[i] = row
    R = [src.u32le() for _ in range(N)]
    out = bytearray(n_out)
    chunk = n_out // N
    ctx = [0] * N

    def dec(j):
        f = R[j] & mask
        s = lut[ctx[j]][f]
        R[j] = F[ctx[j]][s] * (R[j] >> shift) + f - C[ctx[j]][s]
        if R[j] < RANS_L:
            R[j] = (R[j] << 16) | src.u16le()
        ctx[j] = s
        return s

    for k in range(chunk):
        for j in range(N):
            out[j * chunk + k] = dec(j)
    ctx[N - 1] = out[N * chunk - 1] if N * chunk > 0 else 0
    for i in range(N * chunk, n_out):
        out[i] = dec(N - 1)
    return bytes(out)


# ---- transforms ----

def pack_encode(data):
    syms = sorted(set(data))
    if len(syms) > 16:
        return None
    idx = {s: i for i, s in enumerate(syms)}
    if len(syms) <= 1:
        packed = b""
    elif len(syms) <= 2:
        packed = bytearray((len(data) + 7) // 8)
        for i, b in enumerate(data):
            packed[i // 8] |= idx[b] << (i % 8)
    elif len(syms) <= 4:
        packed = bytearray((len(data) + 3) // 4)
        for i, b in enumerate(data):
            packed[i // 4] |= idx[b] << (2 * (i % 4))
    else:
        packed = bytearray((len(data) + 1) // 2)
        for i, b in enumerate(data):
            packed[i // 2] |= idx[b] << (4 * (i % 2))
    meta = bytes([len(syms)]) + bytes(syms) + u7(len(packed))
    return meta, bytes(packed)


def pack_decode(meta, packed, n_out):
    nsym = meta.u8()
    P = [meta.u8() for _ in range(nsym)]
    plen = meta.u7()
    if nsym <= 1:
        return bytes([P[0]] * n_out), plen
    if nsym <= 2:
        bits, per = 1, 8
    elif nsym <= 4:
        bits, per = 2, 4
    else:
        bits, per = 4, 2
    mask = (1 << bits) - 1
    out = bytearray(n_out)
    for i in range(n_out):
        v = packed[i // per] >> (bits * (i % per))
        out[i] = P[v & mask]
    return bytes(out), plen


def rle_encode(data):
    """All 256 symbols RLE-eligible (nsym byte 0): literal stream holds
    one byte per run, run lengths-1 as uint7 in the meta stream."""
    lit = bytearray()
    runs = bytearray()
    i = 0
    while i < len(data):
        j = i
        while j < len(data) and data[j] == data[i]:
            j += 1
        lit.append(data[i])
        runs += u7(j - i - 1)
        i = j
    meta = bytes([0]) + bytes(runs)
    return meta, bytes(lit)


def rle_decode(meta, lit, n_out):
    n = meta.u8()
    if n == 0:
        n = 256
        eligible = [True] * 256
    else:
        eligible = [False] * 256
        for _ in range(n):
            eligible[meta.u8()] = True
    out = bytearray()
    i = 0
    while len(out) < n_out:
        s = lit[i]
        i += 1
        out.append(s)
        if eligible[s]:
            run = meta.u7()
            out += bytes([s]) * run
    assert len(out) == n_out
    return bytes(out)


# ---- top level ----

def encode(data, flags):
    N = 32 if flags & X32 else 4
    out = bytearray([flags])
    if not (flags & NOSZ):
        out += u7(len(data))
    if flags & STRIPE:
        n = 4
        subs = []
        for j in range(n):
            part = data[j::n]
            sub_flags = (flags & (ORDER1 | X32)) | NOSZ
            subs.append(encode(part, sub_flags))
        out.append(n)
        for s in subs:
            out += u7(len(s))
        for s in subs:
            out += s
        return bytes(out)
    stage = data
    if flags & PACK:
        meta, stage = pack_encode(stage)[0], pack_encode(stage)[1]
        out += meta
    if flags & RLE:
        rmeta, stage = rle_encode(stage)
        # odd length flag = uncompressed meta
        out += u7(len(rmeta) * 2 + 1)
        out += u7(len(stage))
        out += rmeta
    if flags & CAT:
        out += stage
    elif flags & ORDER1:
        out += rans1_encode(stage, N, 12, comp_table=len(stage) > 256)
    else:
        out += rans0_encode(stage, N)
    return bytes(out)


def decode(buf, known_len=None):
    src = In(buf)
    flags = src.u8()
    n_out = known_len if flags & NOSZ else src.u7()
    N = 32 if flags & X32 else 4
    if flags & STRIPE:
        n = src.u8()
        clens = [src.u7() for _ in range(n)]
        parts = []
        for j in range(n):
            ulen = n_out // n + (1 if n_out % n > j else 0)
            parts.append(decode(src.read(clens[j]), ulen))
        out = bytearray(n_out)
        for i in range(n_out):
            out[i] = parts[i % n][i // n]
        return bytes(out)
    final_len = n_out
    pack_meta = None
    if flags & PACK:
        pack_meta = src
        nsym_pos = src.o
        nsym = src.u8()
        _ = src.read(nsym)
        n_out = src.u7()
        pack_state = (nsym_pos, final_len)
    rle_len = None
    if flags & RLE:
        rm = src.u7()
        rle_out = n_out
        n_out = src.u7()
        if rm & 1:
            rle_meta = In(src.read(rm >> 1))
        else:
            c = src.u7()
            rle_meta = In(rans0_decode(In(src.read(c)), rm >> 1, 4, 12))
        rle_len = rle_out
    if flags & CAT:
        stage = src.read(n_out)
    elif flags & ORDER1:
        stage = rans1_decode(src, n_out, N)
    else:
        stage = rans0_decode(src, n_out, N)
    if rle_len is not None:
        stage = rle_decode(rle_meta, stage, rle_len)
    if flags & PACK:
        meta = In(buf, pack_state[0])
        stage, _ = pack_decode(meta, stage, pack_state[1])
    return stage


def self_test():
    import random
    random.seed(11)
    corpora = {
        "text": (b"the quick brown fox jumps over the lazy dog " * 30),
        "dna": bytes(random.choice(b"ACGT") for _ in range(2000)),
        "qual": bytes(
            min(40, max(0, int(random.gauss(30, 5)))) + 33 for _ in range(1500)),
        "runs": b"".join(bytes([random.randrange(4) * 60]) *
                         random.randrange(1, 20) for _ in range(200)),
        "rand": bytes(random.randrange(256) for _ in range(997)),
        "tiny": b"AB",
        "one": b"z" * 100,
    }
    flag_sets = [0, ORDER1, X32, ORDER1 | X32, CAT, RLE, ORDER1 | RLE,
                 PACK, ORDER1 | PACK, PACK | RLE, ORDER1 | PACK | RLE,
                 STRIPE, STRIPE | ORDER1, NOSZ, ORDER1 | NOSZ]
    for name, data in corpora.items():
        for fl in flag_sets:
            if fl & PACK and len(set(data)) > 16:
                continue
            enc = encode(data, fl)
            dec = decode(enc, known_len=len(data) if fl & NOSZ else None)
            assert dec == data, f"roundtrip fail: {name} flags={fl}"
    print("ransnx16 self-test OK")


if __name__ == "__main__":
    self_test()
