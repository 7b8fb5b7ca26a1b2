#!/usr/bin/env python3
"""Independent reimplementation of l39_bpe_encode for oracle pinning.

BPE merge induction exactly as pin_l38.py but with 8 rounds, then ENCODE:
  - per word: tokens = len(merged symbol list), chars = len(word)
  - per language: word instances, total tokens, total chars,
    chars_per_token_permille = (chars * 1000) // tokens  (floor int div)

Usage: pin_l39.py <sfDir>   -> prints the DuckDB VALUES oracle
"""
import sys
from collections import Counter, defaultdict

import pyarrow.parquet as pq

ROUNDS = 8


def word_token_counts(sf_dir):
    """Learn ROUNDS merges, return ({word: n_bpe_tokens}, pyarrow table)."""
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    freqs = Counter()
    for text in t.column("text").to_pylist():
        freqs.update(text.split(" "))
    vocab = {w: list(w) for w in freqs}
    for _ in range(ROUNDS):
        pairs = Counter()
        for w, syms in vocab.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        (a, b), _cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return {w: len(syms) for w, syms in vocab.items()}, t


def main(sf_dir):
    ntok, t = word_token_counts(sf_dir)
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    stats = defaultdict(lambda: [0, 0, 0])  # lang -> [words, tokens, chars]
    for text, lang in zip(texts, langs):
        st = stats[lang]
        for w in text.split(" "):
            st[0] += 1
            st[1] += ntok[w]
            st[2] += len(w)
    print('    "l39_bpe_encode" ->')
    print('      """SELECT * FROM (VALUES')
    vals = []
    for lang in sorted(stats):
        nw, nt, nc = stats[lang]
        vals.append(
            f"        |  ('{lang}', CAST({nw} AS BIGINT), CAST({nt} AS BIGINT),"
            f" CAST({nc} AS BIGINT), CAST({nc * 1000 // nt} AS BIGINT))")
    print(",\n".join(vals) + ")")
    print('        |t(lang, n_words, n_tokens, n_chars,'
          ' chars_per_token_permille)')
    print('        |ORDER BY lang""".stripMargin,')


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
