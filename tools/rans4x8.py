#!/usr/bin/env python3
"""Independent rANS 4x8 encoder (orders 0 and 1), written from the public
CRAM 3.0 specification (section 13: 12-bit frequencies, 4 interleaved
states, lower bound 1<<23) — NOT from the repo's Scala decoder. Used to
cross-validate: order-0 streams it emits must decode with the Scala
order-0 path (proving this encoder against the already-fixture-proven
decoder), and its order-1 streams are the known-answer inputs for the
Scala order-1 decoder.

Also used by recompress_cram.py to build an order-1/bzip2 CRAM fixture.
"""

RANS_L = 1 << 23
TOTFREQ = 4096


def itf8(v):
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    if v < 0x10000000:
        return bytes([0xE0 | (v >> 24), (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF])
    return bytes([0xF0 | ((v >> 28) & 0x0F), (v >> 20) & 0xFF, (v >> 12) & 0xFF,
                  (v >> 4) & 0xFF, v & 0x0F])


def normalize(freq_dict, total=TOTFREQ):
    """Scale counts so they sum exactly to `total`, every used symbol >= 1."""
    n = sum(freq_dict.values())
    out = {}
    acc = 0
    items = sorted(freq_dict.items())
    for i, (s, c) in enumerate(items):
        if i == len(items) - 1:
            f = total - acc
        else:
            f = max(1, c * total // n)
            remaining_syms = len(items) - i - 1
            f = min(f, total - acc - remaining_syms)
        assert f >= 1, "frequency normalization starved a symbol"
        out[s] = f
        acc += f
    assert sum(out.values()) == total
    return out


def _rle_serialize(keys, emit_value):
    """CRAM symbol/RLE walk shared by the order-0 table (values are itf8
    frequencies) and the order-1 outer loop (values are nested order-0
    tables): first key byte, then per key its value; after a value (when
    not inside a run) the next key byte, with `k+1` triggering a run-length
    byte covering following consecutive keys; terminated by 0.
    """
    out = bytearray([keys[0]])
    i = 0
    rle = 0
    while i < len(keys):
        out += emit_value(keys[i])
        if rle > 0:
            rle -= 1  # next key is implicit (previous + 1)
        elif i + 1 < len(keys):
            nxt = keys[i + 1]
            out.append(nxt)
            if nxt == keys[i] + 1:
                run = 0
                while i + 2 + run < len(keys) and keys[i + 2 + run] == nxt + 1 + run:
                    run += 1
                out.append(run)
                rle = run
        else:
            out.append(0)
        i += 1
    return bytes(out)


def serialize_freqs(freq):
    syms = sorted(s for s, f in freq.items() if f > 0)
    return _rle_serialize(syms, lambda s: itf8(freq[s]))


def _enc_renorm(x, freq_s, emitted):
    x_max = ((RANS_L >> 12) << 8) * freq_s
    while x >= x_max:
        emitted.append(x & 0xFF)
        x >>= 8
    return x


def _enc_put(x, cum_s, freq_s):
    return ((x // freq_s) << 12) + cum_s + (x % freq_s)


def _assemble(order, table, states, emitted, raw_len):
    body = b"".join(states[j].to_bytes(4, "little") for j in range(4))
    # decoder reads renorm bytes forward in decode order = reverse emission
    body += bytes(reversed(emitted))
    payload = table + body
    return bytes([order]) + len(payload).to_bytes(4, "little") + \
        raw_len.to_bytes(4, "little") + payload


def compress_o0(data):
    if len(data) == 0:
        freq = {0: TOTFREQ}
    else:
        counts = {}
        for b in data:
            counts[b] = counts.get(b, 0) + 1
        freq = normalize(counts)
    cum = {}
    acc = 0
    for s in sorted(freq):
        cum[s] = acc
        acc += freq[s]
    states = [RANS_L] * 4
    emitted = bytearray()
    for i in range(len(data) - 1, -1, -1):
        j = i % 4
        s = data[i]
        states[j] = _enc_renorm(states[j], freq[s], emitted)
        states[j] = _enc_put(states[j], cum[s], freq[s])
    return _assemble(0, serialize_freqs(freq), states, emitted, len(data))


def compress_o1(data):
    n = len(data)
    isz4 = n >> 2
    quarter_starts = {0, isz4, 2 * isz4, 3 * isz4}

    def ctx_of(p):
        return 0 if p in quarter_starts else data[p - 1]

    counts = {}
    for p in range(n):
        c = ctx_of(p)
        counts.setdefault(c, {})
        counts[c][data[p]] = counts[c].get(data[p], 0) + 1
    if not counts:
        counts = {0: {0: 1}}
    freqs = {c: normalize(cnt) for c, cnt in counts.items()}
    cums = {}
    for c, f in freqs.items():
        acc = 0
        cums[c] = {}
        for s in sorted(f):
            cums[c][s] = acc
            acc += f[s]

    ctxs = sorted(freqs)
    table = _rle_serialize(ctxs, lambda c: serialize_freqs(freqs[c]))

    # decoder's read order: for i in 0..isz4-1 states 0,1,2,3 decode
    # position j*isz4+i; then the mod-4 tail via state 3. Encode in exact
    # reverse.
    steps = [(j, j * isz4 + i) for i in range(isz4) for j in range(4)]
    steps += [(3, p) for p in range(4 * isz4, n)]
    states = [RANS_L] * 4
    emitted = bytearray()
    for j, p in reversed(steps):
        c = ctx_of(p)
        s = data[p]
        states[j] = _enc_renorm(states[j], freqs[c][s], emitted)
        states[j] = _enc_put(states[j], cums[c][s], freqs[c][s])
    return _assemble(1, table, states, emitted, n)


def _read_itf8(b, o):
    f = b[o]
    o += 1
    if f < 0x80:
        return f, o
    if f < 0xC0:
        return ((f & 0x3F) << 8) | b[o], o + 1
    if f < 0xE0:
        return ((f & 0x1F) << 16) | (b[o] << 8) | b[o + 1], o + 2
    if f < 0xF0:
        return ((f & 0x0F) << 24) | (b[o] << 16) | (b[o + 1] << 8) | b[o + 2], o + 3
    v = ((f & 0x0F) << 28) | (b[o] << 20) | (b[o + 1] << 12) | (b[o + 2] << 4) | \
        (b[o + 3] & 0x0F)
    return v, o + 4


def _read_freqs0(b, o):
    freq = {}
    sym = b[o]
    o += 1
    rle = 0
    while True:
        freq[sym], o = _read_itf8(b, o)
        if rle > 0:
            rle -= 1
            sym += 1
        else:
            nxt = b[o]
            o += 1
            if nxt == sym + 1:
                sym = nxt
                rle = b[o]
                o += 1
            elif nxt == 0:
                return freq, o
            else:
                sym = nxt
    return freq, o


def decompress_rans(data):
    """rANS 4x8 decoder (orders 0/1), mirror of the encoders above."""
    order = data[0]
    rsize = int.from_bytes(data[5:9], "little")
    o = 9
    if order == 0:
        freq, o = _read_freqs0(data, o)
        tabs = {0: freq}
    else:
        tabs = {}
        ctx = data[o]
        o += 1
        rle = 0
        while True:
            tabs[ctx], o = _read_freqs0(data, o)
            if rle > 0:
                rle -= 1
                ctx += 1
            else:
                nxt = data[o]
                o += 1
                if nxt == ctx + 1:
                    ctx = nxt
                    rle = data[o]
                    o += 1
                elif nxt == 0:
                    break
                else:
                    ctx = nxt
    cums, luts = {}, {}
    for c, f in tabs.items():
        acc = 0
        cums[c] = {}
        lut = [0] * TOTFREQ
        for s in sorted(f):
            cums[c][s] = acc
            for x in range(acc, acc + f[s]):
                lut[x] = s
            acc += f[s]
        luts[c] = lut
    states = []
    for _ in range(4):
        states.append(int.from_bytes(data[o:o + 4], "little"))
        o += 4
    out = bytearray(rsize)
    ctxs = [0, 0, 0, 0]

    def step(j, pos):
        nonlocal o
        c = ctxs[j] if order == 1 else 0
        slot = states[j] & 0xFFF
        s = luts[c][slot]
        out[pos] = s
        states[j] = tabs[c][s] * (states[j] >> 12) + slot - cums[c][s]
        while states[j] < RANS_L and o < len(data):
            states[j] = ((states[j] << 8) | data[o]) & 0xFFFFFFFFFFFF
            o += 1
        ctxs[j] = s

    if order == 0:
        for i in range(rsize):
            step(i % 4, i)
    else:
        isz4 = rsize >> 2
        for i in range(isz4):
            for j in range(4):
                step(j, j * isz4 + i)
        for p in range(4 * isz4, rsize):
            step(3, p)
    return bytes(out)


if __name__ == "__main__":
    import sys
    order = int(sys.argv[1])
    data = sys.stdin.buffer.read()
    enc = compress_o0(data) if order == 0 else compress_o1(data)
    sys.stdout.buffer.write(enc)
