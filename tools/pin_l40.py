#!/usr/bin/env python3
"""Independent reimplementation of l40_tokenizer_maxmatch for oracle pinning.

Maximum-matching tokenizer induction exactly as LlmQueries."l40_tokenizer_maxmatch":
  - word frequencies over whitespace-split text (empty words skipped)
  - seed pieces: all substrings of length <= 4, occurrence-counted weighted
    by word freq; inventory = ALL single chars + top-40 multi-char pieces
    (ties: lexicographically smaller piece)
  - 2 rounds: segment every word with the exact DP (min piece count, ties
    -> max summed piece frequency, ties -> longest trailing piece), count
    piece usage weighted by word freq, prune to singles + top-24 multis
  - output: top-10 (piece, used) of the final round's usage,
    ordered used desc then piece asc

Usage: pin_l40.py <sfDir>   -> prints the DuckDB VALUES oracle
"""
import sys
from collections import Counter

import pyarrow.parquet as pq

MAXLEN = 4
SEED_MULTI = 40
KEEP_MULTI = 24


def segment(word, pm):
    # best[i]: (np, -sc, p_start) optimal for prefix of length i, plus seg
    n = len(word)
    best = [(0, 0, 0, [])]  # (np, sc, p, seg) for prefix length 0
    for i in range(1, n + 1):
        cands = []
        for p in range(max(1, i - MAXLEN + 1), i + 1):
            piece = word[p - 1:i]
            if piece not in pm:
                continue
            np_, sc, _, seg = best[p - 1]
            cands.append((np_ + 1, sc + pm[piece], p, seg + [piece]))
        # min np, then max sc, then min p (longest trailing piece)
        cands.sort(key=lambda c: (c[0], -c[1], c[2]))
        best.append(cands[0])
    return best[n][3]


def inventory(counts, singles, top_n):
    multi = sorted(((p, c) for p, c in counts.items() if p not in singles),
                   key=lambda kv: (-kv[1], kv[0]))[:top_n]
    inv = {c: counts.get(c, 0) for c in singles}
    inv.update(dict(multi))
    return inv


def main(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    freqs = Counter()
    for text in t.column("text").to_pylist():
        freqs.update(w for w in text.split(" ") if w)
    sub_cnt = Counter()
    for w, f in freqs.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + MAXLEN) + 1):
                sub_cnt[w[i:j]] += f
    singles = {p for p in sub_cnt if len(p) == 1}
    pieces = inventory(sub_cnt, singles, SEED_MULTI)
    for _ in range(2):
        usage = Counter()
        for w, f in freqs.items():
            for piece in segment(w, pieces):
                usage[piece] += f
        pieces = inventory(usage, singles, KEEP_MULTI)
    top = sorted(usage.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    print('    "l40_tokenizer_maxmatch" ->')
    print('      """SELECT * FROM (VALUES')
    vals = [f"        |  ('{p}', CAST({c} AS BIGINT))" for p, c in top]
    print(",\n".join(vals) + ")")
    print('        |t(piece, used) ORDER BY used DESC, piece""".stripMargin,')


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
