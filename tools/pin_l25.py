#!/usr/bin/env python3
"""Independent reimplementation of the l25 semantic-dedup pipeline
(fixed-point k-means + within-cluster cosine prune), used to PIN its
expected output as a typed DuckDB VALUES oracle.

The Spark side runs entirely in fixed-point: embeddings are
unit-normalized then quantized to a 1e-6 integer grid, so every
distributed sum is an exact integer and the result is bit-identical
under any partitioning. This script replicates that arithmetic with
plain Python ints/floats (no numpy in the kernels — numpy's pairwise
summation would NOT match the sequential folds).

Usage: python3 tools/pin_l25.py <sfDir> [sparkVerifyOutDir]
"""
import glob
import math
import sys
from decimal import Decimal, ROUND_HALF_UP

import pyarrow.parquet as pq

K = 8
ITERS = 4
TAU = 0.4


def spark_round4(x):
    # Spark round(DOUBLE, 4): BigDecimal.valueOf(x).setScale(4, HALF_UP);
    # repr() gives the same shortest round-trip decimal as Double.toString
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def quantize(vec):
    # sequential fold, same order as Spark's aggregate()
    s = 0.0
    for x in vec:
        x = float(x)
        s = s + x * x
    norm = math.sqrt(s)
    return [math.floor(float(x) / norm * 1e6 + 0.5) for x in vec]


def dotq(a, b):
    # exact integer dot product (products <= 1e12, dim 64 -> < 2^53)
    return sum(x * y for x, y in zip(a, b))


def run(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = t["vec_id"].to_pylist()
    embs = t["embedding"].to_pylist()
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    ids = [ids[i] for i in order]
    q = [quantize(embs[i]) for i in order]

    # init: the K smallest vec_ids, cid = rank
    cents = [list(q[i]) for i in range(K)]

    def assign():
        out = []
        for i in range(len(ids)):
            best, bestd = 0, None
            for cid in range(K):
                d = dotq(q[i], cents[cid])
                if bestd is None or d > bestd:  # tie -> lowest cid
                    best, bestd = cid, d
            out.append(best)
        return out

    for _ in range(ITERS):
        a = assign()
        for cid in range(K):
            members = [q[i] for i in range(len(ids)) if a[i] == cid]
            if not members:
                continue  # empty cluster keeps its centroid
            n = len(members)
            dim = len(members[0])
            # exact integer column sums, then driver-side double math
            mean = [sum(m[p] for m in members) / n for p in range(dim)]
            m2 = 0.0
            for v in mean:
                m2 += v * v
            mnorm = math.sqrt(m2)
            cents[cid] = [math.floor(v / mnorm * 1e6 + 0.5) for v in mean]

    a = assign()
    dropped = {}  # idb -> (min ida, score_raw of that pair)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if a[i] != a[j]:
                continue
            ia, ib = (i, j) if ids[i] < ids[j] else (j, i)
            score = dotq(q[ia], q[ib]) / 1e12
            if score >= TAU:
                cur = dropped.get(ids[ib])
                if cur is None or ids[ia] < cur[0]:
                    dropped[ids[ib]] = (ids[ia], score)
    return sorted((vid, da, spark_round4(s)) for vid, (da, s) in dropped.items())


def to_sql(rows):
    vals = ",\n".join(
        f"  (CAST({v} AS BIGINT), CAST({d} AS BIGINT), CAST({s} AS DOUBLE))"
        for v, d, s in rows)
    return ("SELECT * FROM (VALUES\n" + vals +
            ")\nt(vec_id, dup_of, score)\nORDER BY vec_id")


def main():
    sf_dir = sys.argv[1]
    rows = run(sf_dir)
    print(f"-- l25: {len(rows)} rows")
    print(to_sql(rows))
    if len(sys.argv) > 2:
        import pyarrow.dataset as ds
        st = ds.dataset(
            glob.glob(f"{sys.argv[2]}/l25_semantic_dedup/*.parquet")).to_table()
        spark = sorted(zip(st["vec_id"].to_pylist(), st["dup_of"].to_pylist(),
                           st["score"].to_pylist()))
        ok = spark == rows
        if not ok:
            print(f"MISMATCH l25: spark={len(spark)} py={len(rows)}")
            sset = set(map(tuple, rows))
            print("  spark-only:", [r for r in spark if r not in sset][:5])
            pset = set(map(tuple, spark))
            print("  py-only:   ", [r for r in rows if tuple(r) not in pset][:5])
        print("PIN MATCHES SPARK" if ok else "PIN DOES NOT MATCH")
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
