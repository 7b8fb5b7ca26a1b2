#!/usr/bin/env python3
"""Independent reimplementation of l36_pq_adc_search for oracle pinning.

Reuses pin_l35's integer-grid PQ trainer, then runs asymmetric-distance
search exactly as LlmQueries."l36_pq_adc_search":
  - queries = vectors with vec_id % 50 == 0 (their exact integer subvectors)
  - per (query, subspace): a K-entry integer table of L2 distances to the
    trained codebook
  - every other vector scores as the sum of 4 table lookups at its codes
  - top-3 per query, ties -> smaller vec_id, self excluded

Usage: pin_l36.py <sfDir>   -> prints the DuckDB VALUES oracle
"""
import sys

sys.path.insert(0, __import__("os").path.dirname(__file__))
from pin_l35 import train, M, K


def main(sf_dir):
    subs, cents, a, lab = train(sf_dir)
    vids = sorted(lab)
    queries = [v for v in vids if v % 50 == 0]
    rows = []
    for qid in queries:
        tables = []
        for m in range(M):
            sv = subs[(qid, m)]
            tables.append([sum((x - c) * (x - c) for x, c in zip(sv, cents[(m, cid)]))
                           for cid in range(K)])
        scored = []
        for vid in vids:
            if vid == qid:
                continue
            adist = sum(tables[m][a[(vid, m)][1]] for m in range(M))
            scored.append((adist, vid))
        scored.sort()
        for rank, (adist, vid) in enumerate(scored[:3], start=1):
            rows.append((qid, rank, vid, adist))
    print('    "l36_pq_adc_search" ->')
    print('      """SELECT * FROM (VALUES')
    vals = [f"        |  (CAST({q} AS BIGINT), {r}, CAST({v} AS BIGINT), "
            f"CAST({d} AS BIGINT))" for q, r, v, d in rows]
    print(",\n".join(vals) + ")")
    print('        |t(qid, rank, vec_id, adist) '
          'ORDER BY qid, rank""".stripMargin,')


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
