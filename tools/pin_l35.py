#!/usr/bin/env python3
"""Independent reimplementation of l35_pq_encode for oracle pinning.

Product quantization on the 1e-6 integer grid, mirroring
LlmQueries."l35_pq_encode" exactly:
  - q_i = floor(float64(x_i) * 1e6 + 0.5)  (exact longs)
  - M=4 subspaces of 16 dims, K=16 centroids each, init = subvectors of
    vec_id < 16 (cid = vec_id), 3 Lloyd's iterations
  - assignment: min integer L2, ties -> smaller cid
  - update: per-dim floor(sum / n + 0.5) (double division, exact for these
    magnitudes); empty clusters keep their centroid
  - output: per label, (n, sum of reconstruction errors, positional code
    checksum sum(c0 + 17*c1 + 289*c2 + 4913*c3))

Usage: pin_l35.py <sfDir>   -> prints the DuckDB VALUES oracle
"""
import math
import sys

import pyarrow.parquet as pq

M, SUB, K, ITERS = 4, 16, 16, 3


def train(sf_dir):
    """Returns (subs, cents, a, lab): subvectors, trained codebook, final
    assignment {(vid, m): (err, cid)}, and vec_id -> label."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vec_ids = t.column("vec_id").to_pylist()
    embs = t.column("embedding").to_pylist()
    labels = t.column("label").to_pylist()
    rows = sorted(zip(vec_ids, embs, labels))
    q = {vid: [math.floor(float(x) * 1e6 + 0.5) for x in e] for vid, e, _ in rows}
    lab = {vid: l for vid, _, l in rows}

    subs = {(vid, m): q[vid][m * SUB:(m + 1) * SUB] for vid in q for m in range(M)}
    cents = {(m, cid): list(subs[(cid, m)]) for m in range(M) for cid in range(K)}

    def assign():
        out = {}
        for (vid, m), s in subs.items():
            best = None
            for cid in range(K):
                c = cents[(m, cid)]
                d = sum((a - b) * (a - b) for a, b in zip(s, c))
                if best is None or (d, cid) < best[:2]:
                    best = (d, cid)
            out[(vid, m)] = best  # (err, cid)
        return out

    for _ in range(ITERS):
        a = assign()
        sums = {}
        for (vid, m), (_, cid) in a.items():
            acc = sums.setdefault((m, cid), [0, [0] * SUB])
            acc[0] += 1
            for i, v in enumerate(subs[(vid, m)]):
                acc[1][i] += v
        for (m, cid), (n, s) in sums.items():
            cents[(m, cid)] = [math.floor(si / n + 0.5) for si in s]

    return subs, cents, assign(), lab


def main(sf_dir):
    _, _, a, lab = train(sf_dir)
    per_label = {}
    for vid in sorted(lab):
        err = sum(a[(vid, m)][0] for m in range(M))
        c = [a[(vid, m)][1] for m in range(M)]
        ck = c[0] + 17 * c[1] + 289 * c[2] + 4913 * c[3]
        acc = per_label.setdefault(lab[vid], [0, 0, 0])
        acc[0] += 1
        acc[1] += err
        acc[2] += ck
    print('    "l35_pq_encode" ->')
    print('      """SELECT * FROM (VALUES')
    vals = []
    for l in sorted(per_label):
        n, se, ck = per_label[l]
        vals.append(f"        |  ({l}, CAST({n} AS BIGINT), "
                    f"CAST({se} AS BIGINT), CAST({ck} AS BIGINT))")
    print(",\n".join(vals) + ")")
    print('        |t(label, n, sum_err, code_checksum) '
          'ORDER BY label""".stripMargin,')


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
