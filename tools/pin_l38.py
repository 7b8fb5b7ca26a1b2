#!/usr/bin/env python3
"""Independent reimplementation of l38_bpe_merges for oracle pinning.

BPE merge induction exactly as LlmQueries."l38_bpe_merges":
  - word frequencies over whitespace-split text
  - symbols start as single characters
  - 3 rounds: count adjacent pairs weighted by word freq (words with >= 2
    symbols only), pick (max count, lexicographically smallest pair),
    merge greedily left-to-right in every word
  - output: (round, "a b", count)

Usage: pin_l38.py <sfDir>   -> prints the DuckDB VALUES oracle
"""
import sys
from collections import Counter

import pyarrow.parquet as pq

ROUNDS = 3


def main(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    freqs = Counter()
    for text in t.column("text").to_pylist():
        freqs.update(text.split(" "))
    vocab = {w: list(w) for w in freqs}
    rows = []
    for r in range(1, ROUNDS + 1):
        pairs = Counter()
        for w, syms in vocab.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        rows.append((r, f"{a} {b}", cnt))
        for w, syms in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    print('    "l38_bpe_merges" ->')
    print('      """SELECT * FROM (VALUES')
    vals = [f"        |  ({r}, '{p}', CAST({c} AS BIGINT))" for r, p, c in rows]
    print(",\n".join(vals) + ")")
    print('        |t(round, pair, cnt) ORDER BY round""".stripMargin,')


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
