#!/usr/bin/env python3
"""Independent oracle for l50_longest_dup_span.

Computes, over the sf0.01 documents table, the maximum n for which some
token n-gram occurs at least twice corpus-wide (any documents, including
within one), then the number of distinct duplicated n-grams at that
length and the lexicographically smallest one. Pure Python counting —
no Spark, no graft code. "Repeated at n" is monotone (a repeated n-gram's
prefix repeats at n-1), which is what licenses the engine's binary
search. Emits the VALUES row pinned into
LlmQueries.oracles("l50_longest_dup_span").
"""
import sys
from collections import Counter

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
docs = duckdb.sql(
    f"SELECT text FROM '{SF}/documents.parquet' ORDER BY doc_id").fetchall()
words = [t[0].split(" ") for t in docs]


def dup_grams(n):
    c = Counter()
    for w in words:
        for i in range(len(w) - n + 1):
            c[" ".join(w[i:i + n])] += 1
    return {g: k for g, k in c.items() if k >= 2}


lo, hi = 0, max(len(w) for w in words)
assert dup_grams(1)
lo = 1
while lo < hi:  # max n with dup_grams(n) non-empty
    mid = (lo + hi + 1) // 2
    if dup_grams(mid):
        lo = mid
    else:
        hi = mid - 1
L = lo
d = dup_grams(L)
mg = min(d)
print(f"L={L} n_dup_grams={len(d)} min_gram='{mg}' min_gram_cnt={d[mg]}")
print(f"  (CAST({L} AS BIGINT), CAST({len(d)} AS BIGINT), '{mg}', CAST({d[mg]} AS BIGINT))")
