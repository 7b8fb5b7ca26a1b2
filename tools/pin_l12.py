#!/usr/bin/env python3
"""Independent reimplementation of the winnowing document fingerprint
(l12): FNV-1a over char 8-grams, window 4 with rightmost-minimum selection,
XOR of selected minima — rebuilt from the published winnowing algorithm
(Schleimer/Wilkerson/Aiken, SIGMOD'03) and the FNV spec, not from the Scala
code. Pins the l12 oracle and cross-checks the Spark output.

Usage: python3 tools/pin_l12.py <sfDir> [sparkVerifyOutDir]
"""
import sys
import glob

import pyarrow.parquet as pq

M64 = (1 << 64) - 1


def s64(x):
    x &= M64
    return x - (1 << 64) if x >= (1 << 63) else x


def utf16_units(s):
    b = s.encode("utf-16-be")
    return [int.from_bytes(b[i:i + 2], "big") for i in range(0, len(b), 2)]


def fnv1a64_gram(units, i, k):
    h = 0xcbf29ce484222325
    for j in range(k):
        h ^= units[i + j]
        h = (h * 0x100000001b3) & M64
    return h


def simhash64(text):
    counts = [0] * 64
    for w in text.split(" "):
        h = 0xcbf29ce484222325
        for cu in utf16_units(w):
            h ^= cu
            h = (h * 0x100000001b3) & M64
        for bit in range(64):
            counts[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if counts[bit] > 0:
            out |= 1 << bit
    return out


def winnow(text, k=8, w=4):
    units = utf16_units(text)
    if len(units) < k + w - 1:  # window loop would never run below this
        return s64(simhash64(text))
    n = len(units) - k + 1
    hs = [s64(fnv1a64_gram(units, i, k)) for i in range(n)]  # signed compare
    out = 0
    prev_min = -1
    for i in range(0, n - w + 1):
        min_idx = i
        for j in range(i + 1, i + w):
            if hs[j] <= hs[min_idx]:
                min_idx = j
        if min_idx != prev_min:
            out ^= hs[min_idx] & M64
            prev_min = min_idx
    return s64(out)


def main():
    sf_dir = sys.argv[1]
    out_dir = sys.argv[2] if len(sys.argv) > 2 else None
    d = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rows = [(i, winnow(t))
            for i, t in zip(d.column("doc_id").to_pylist(), d.column("text").to_pylist())
            if i < 50]
    rows.sort()
    vals = ",\n".join(f"  (CAST({i} AS BIGINT), CAST({fp} AS BIGINT))" for i, fp in rows)
    sql = f"SELECT * FROM (VALUES\n{vals}\n) t(doc_id, fp) ORDER BY doc_id"
    print(f"-- l12: {len(rows)} rows")
    print(sql)
    if out_dir:
        files = sorted(glob.glob(f"{out_dir}/l12_winnow_fingerprint/*.parquet"))
        import pyarrow as pa
        t = pa.concat_tables([pq.read_table(f) for f in files])
        got = sorted(zip(t.column("doc_id").to_pylist(), t.column("fp").to_pylist()))
        if got == rows:
            print("PINS MATCH SPARK")
        else:
            bad = [(a, b) for a, b in zip(got, rows) if a != b][:5]
            print(f"MISMATCH: {bad}")
            sys.exit(1)


if __name__ == "__main__":
    main()
