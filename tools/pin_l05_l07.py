#!/usr/bin/env python3
"""Independent reimplementation of the l05 (SimHash banding) and l07
(random-hyperplane LSH ANN) pipelines, used to PIN their expected outputs
as typed DuckDB VALUES oracles.

Everything here is rebuilt from the published algorithm specs — FNV-1a,
SimHash sign-votes, the java.util.Random LCG (JDK javadoc documents the
exact recurrence) and Marsaglia-polar nextGaussian — NOT by calling the
Scala code, so a bug in the Spark-side kernels or plumbing shows up as a
mismatch against these pins.

Usage: python3 tools/pin_l05_l07.py <sfDir> [sparkVerifyOutDir]

Prints the two oracle SQL strings; if sparkVerifyOutDir is given, also
diffs them against the Spark parquet outputs and exits non-zero on any
mismatch.
"""
import sys
import glob
from decimal import Decimal, ROUND_HALF_UP

import pyarrow.parquet as pq

M64 = (1 << 64) - 1


# ---- l05: SimHash (FNV-1a word hashes, sign-vote bits), 16-bit banding ----

def fnv1a64(word):
    h = 0xcbf29ce484222325
    # iterate UTF-16 code units to match Java's charAt
    b = word.encode("utf-16-be")
    for i in range(0, len(b), 2):
        h ^= int.from_bytes(b[i:i + 2], "big")
        h = (h * 0x100000001b3) & M64
    return h


def simhash64(text):
    counts = [0] * 64
    for w in text.split(" "):
        h = fnv1a64(w)
        for bit in range(64):
            counts[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if counts[bit] > 0:
            out |= 1 << bit
    return out


def l05_rows(docs):
    # Banding-independent pin: ALL pairs at hamming <= 6. The Spark side's
    # Manku multi-block banding (8 blocks, C(8,2) block-pair keys) has
    # total recall at this threshold by pigeonhole, so its verified output
    # must equal the exhaustive answer — any banding recall bug shows up
    # as missing rows against this pin.
    sh = sorted((d, simhash64(t)) for d, t in docs)
    rows = []
    for i in range(len(sh)):
        a, sa = sh[i]
        for j in range(i + 1, len(sh)):
            b, sb = sh[j]
            ham = bin(sa ^ sb).count("1")
            if ham <= 6:
                rows.append((a, b, ham))
    rows.sort()
    return rows


# ---- l07: java.util.Random LCG + Marsaglia-polar nextGaussian ----

class JavaRandom:
    def __init__(self, seed):
        self.seed = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)
        self.have_g = False
        self.next_g = 0.0

    def _next(self, bits):
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        r = self.seed >> (48 - bits)
        if r >= (1 << (bits - 1)):  # sign for 32-bit values
            r -= 1 << bits
        return r

    def next_double(self):
        hi = self._next(26) & ((1 << 26) - 1)
        lo = self._next(27) & ((1 << 27) - 1)
        return ((hi << 27) + lo) / float(1 << 53)

    def next_gaussian(self):
        import math
        if self.have_g:
            self.have_g = False
            return self.next_g
        while True:
            v1 = 2 * self.next_double() - 1
            v2 = 2 * self.next_double() - 1
            s = v1 * v1 + v2 * v2
            if 0 < s < 1:
                break
        mult = math.sqrt(-2 * math.log(s) / s)
        self.next_g = v2 * mult
        self.have_g = True
        return v1 * mult


def hyperplanes():
    rnd = JavaRandom(7)
    return [[rnd.next_gaussian() for _ in range(64)] for _ in range(8)]


def bucket(planes, v):
    sig = 0
    for p in range(8):
        plane = planes[p]
        dot = 0.0
        for i in range(min(len(v), 64)):
            dot += v[i] * plane[i]
        if dot >= 0:
            sig |= 1 << p
    return sig


def cosine(a, b):
    import math
    dot = na = nb = 0.0
    for i in range(min(len(a), len(b))):
        dot += a[i] * b[i]
        na += a[i] * a[i]
        nb += b[i] * b[i]
    return 0.0 if na == 0.0 or nb == 0.0 else dot / math.sqrt(na * nb)


def spark_round4(x):
    # Spark round(DOUBLE, 4): BigDecimal.valueOf(x).setScale(4, HALF_UP);
    # repr() gives the same shortest round-trip string as Double.toString.
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def l07_rows(embs):
    planes = hyperplanes()
    bk = {vid: bucket(planes, v) for vid, v in embs}
    queries = [(vid, v) for vid, v in embs if vid < 50]
    by_bucket = {}
    for vid, v in embs:
        by_bucket.setdefault(bk[vid], []).append((vid, v))
    rows = []
    for qid, qv in queries:
        cands = [(vid, spark_round4(cosine(qv, v)))
                 for vid, v in by_bucket.get(bk[qid], []) if vid != qid]
        cands.sort(key=lambda t: (-t[1], t[0]))
        for vid, score in cands[:3]:
            rows.append((qid, vid, score))
    rows.sort(key=lambda t: (t[0], -t[2], t[1]))
    return rows


def sql_values(rows, cols, types, order=None):
    def lit(v, t):
        if t == "BIGINT":
            return f"CAST({v} AS BIGINT)"
        if t == "INTEGER":
            return f"CAST({v} AS INTEGER)"
        if t == "DOUBLE":
            return f"CAST({v!r} AS DOUBLE)"
        raise ValueError(t)
    vals = ",\n".join("  (" + ", ".join(lit(v, t) for v, t in zip(r, types)) + ")"
                      for r in rows)
    collist = ", ".join(cols)
    order = order or ", ".join(cols[:2])
    return (f"SELECT * FROM (VALUES\n{vals}\n) t({collist}) ORDER BY {order}")


def read_spark(outdir, name, cols):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    import pyarrow as pa
    t = pa.concat_tables([pq.read_table(f) for f in files])
    return sorted(zip(*[t.column(c).to_pylist() for c in cols]))


def main():
    sf_dir = sys.argv[1]
    out_dir = sys.argv[2] if len(sys.argv) > 2 else None

    d = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(d.column("doc_id").to_pylist(), d.column("text").to_pylist()))
    e = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    embs = list(zip(e.column("vec_id").to_pylist(), e.column("embedding").to_pylist()))

    r05 = l05_rows(docs)
    r07 = l07_rows(embs)
    print(f"-- l05: {len(r05)} rows")
    sql05 = sql_values(r05, ["ida", "idb", "hamming"], ["BIGINT", "BIGINT", "INTEGER"])
    print(sql05)
    print(f"-- l07: {len(r07)} rows")
    # same ORDER BY as the Spark query (driver contract: identical ordering)
    sql07 = sql_values(r07, ["qid", "neighbor_id", "score"],
                       ["BIGINT", "BIGINT", "DOUBLE"],
                       order="qid, score DESC, neighbor_id")
    print(sql07)

    if out_dir:
        ok = True
        s05 = read_spark(out_dir, "l05_simhash_pairs", ["ida", "idb", "hamming"])
        if s05 != sorted(r05):
            ok = False
            print(f"MISMATCH l05: spark={len(s05)} py={len(r05)}")
            print("  spark-only:", [r for r in s05 if r not in set(map(tuple, r05))][:5])
            print("  py-only:   ", [r for r in r05 if tuple(r) not in set(s05)][:5])
        s07 = read_spark(out_dir, "l07_ann_lsh", ["qid", "neighbor_id", "score"])
        if s07 != sorted(r07, key=lambda t: (t[0], t[1], t[2])):
            ok = False
            print(f"MISMATCH l07: spark={len(s07)} py={len(r07)}")
            print("  spark-only:", [r for r in s07 if r not in set(map(tuple, r07))][:5])
            print("  py-only:   ", [r for r in r07 if tuple(r) not in set(s07)][:5])
        print("PINS MATCH SPARK" if ok else "PINS DO NOT MATCH")
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
