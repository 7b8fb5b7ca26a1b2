#!/usr/bin/env python3
"""Independent oracle for l52_label_propagation.

Rebuilds the whole pipeline from the published specs — java.util.Random
LCG + Marsaglia-polar nextGaussian (JDK javadoc), T=4 six-bit
hyperplane tables seeded 1000+t, candidate pairs = bucket mates under
any table, exact double cosine rerank to top-5 out-neighbors (ties by
dst), then 4 rounds of clamped majority-vote propagation from the
vec_id %% 5 == 0 seed set (ties -> smallest label). Pure Python — no
Spark/graft code — so a kernel or plumbing bug shows up as a mismatch.

Usage: python3 tools/pin_l52.py <sfDir>
Prints the VALUES oracle rows for LlmQueries.oracles("l52_...").
"""
import sys
import math
from collections import defaultdict

import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


class JavaRandom:
    def __init__(self, seed):
        self.seed = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def _next(self, bits):
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        r = self.seed >> (48 - bits)
        if r >= (1 << (bits - 1)):
            r -= 1 << bits
        return r

    def next_double(self):
        hi = self._next(26) & ((1 << 26) - 1)
        lo = self._next(27) & ((1 << 27) - 1)
        return ((hi << 27) + lo) / float(1 << 53)

    def next_gaussian(self):
        if getattr(self, "have_g", False):
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


T, BITS, K, ROUNDS = 4, 6, 5, 4

tables = []
for t in range(T):
    rnd = JavaRandom(1000 + t)
    tables.append([[rnd.next_gaussian() for _ in range(64)]
                   for _ in range(BITS)])

tb = pq.read_table(f"{SF}/embeddings.parquet")
ids = tb.column("vec_id").to_pylist()
vecs = tb.column("embedding").to_pylist()
labs = tb.column("label").to_pylist()
V = {i: [float(x) for x in v] for i, v in zip(ids, vecs)}
truth = dict(zip(ids, labs))


def buckets(v):
    out = []
    for t in range(T):
        sig = 0
        for p in range(BITS):
            plane = tables[t][p]
            dot = 0.0
            for i in range(min(len(v), 64)):
                dot += v[i] * plane[i]
            if dot >= 0:
                sig |= 1 << p
        out.append(t * 64 + sig)
    return out


def cosine(a, b):
    dot = na = nb = 0.0
    for i in range(min(len(a), len(b))):
        dot += a[i] * b[i]
        na += a[i] * a[i]
        nb += b[i] * b[i]
    return 0.0 if na == 0.0 or nb == 0.0 else dot / math.sqrt(na * nb)


bymember = defaultdict(set)
for i in ids:
    for b in buckets(V[i]):
        bymember[b].add(i)
cand = defaultdict(set)
for b, members in bymember.items():
    for a in members:
        for c in members:
            if a != c:
                cand[a].add(c)

edges = {}
for src in ids:
    ranked = sorted(((-cosine(V[src], V[d]), d) for d in cand[src]))
    edges[src] = [d for _, d in ranked[:K]]

cur = {i: (truth[i] if i % 5 == 0 else -1) for i in ids}
for _ in range(ROUNDS):
    nxt = dict(cur)
    for src in ids:
        if src % 5 == 0:
            continue
        votes = defaultdict(int)
        for d in edges[src]:
            if cur[d] != -1:
                votes[cur[d]] += 1
        if votes:
            nxt[src] = min(votes, key=lambda l: (-votes[l], l))
    cur = nxt

conf = defaultdict(int)
for i in ids:
    if i % 5 != 0:
        conf[(truth[i], cur[i])] += 1

acc = sum(n for (t_, p), n in conf.items() if t_ == p)
tot = sum(conf.values())
print(f"-- non-seed accuracy {acc}/{tot}")
rows = ",\n".join(
    f"  (CAST({t_} AS BIGINT), CAST({p} AS BIGINT), CAST({n} AS BIGINT))"
    for (t_, p), n in sorted(conf.items()))
print("SELECT * FROM (VALUES\n" + rows + "\n) t(label, pred, n) "
      "ORDER BY label, pred")
