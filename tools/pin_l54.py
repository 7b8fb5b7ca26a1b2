#!/usr/bin/env python3
"""Independent oracle for l54_token_decontamination.

The GPT-3 appendix-C decontamination spec moved to TOKEN space: learn the
same 8-round BPE as pin_l38/pin_l39, encode every document to its subword
token stream, build distinct 13-token-gram sets per document, take
doc_id %% 7 == 0 as the held-out eval set, and flag every training
document sharing at least one 13-gram with any eval document. Pure
Python reimplementation — no Spark/graft code.

Usage: pin_l54.py <sfDir>   -> prints the DuckDB VALUES oracle
"""
import sys
from collections import Counter, defaultdict

import pyarrow.parquet as pq

ROUNDS = 8
N = 13


def bpe_vocab(freqs):
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
    return vocab


def main(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    freqs = Counter()
    for text in texts:
        freqs.update(text.split(" "))
    vocab = bpe_vocab(freqs)

    def grams(text):
        toks = [s for w in text.split(" ") for s in vocab[w]]
        return {" ".join(toks[i:i + N]) for i in range(len(toks) - N + 1)}

    eval_grams = set()
    for i, text in zip(ids, texts):
        if i % 7 == 0:
            eval_grams |= grams(text)

    stats = defaultdict(lambda: [0, 0, 0])  # lang -> [train, contam, shared]
    for i, text, lang in zip(ids, texts, langs):
        if i % 7 == 0:
            continue
        st = stats[lang]
        st[0] += 1
        shared = len(grams(text) & eval_grams)
        if shared:
            st[1] += 1
        st[2] += shared

    print('    "l54_token_decontamination" ->')
    print('      """SELECT * FROM (VALUES')
    vals = []
    for lang in sorted(stats):
        a, b, c = stats[lang]
        vals.append(f"        |  ('{lang}', CAST({a} AS BIGINT),"
                    f" CAST({b} AS BIGINT), CAST({c} AS BIGINT))")
    print(",\n".join(vals) + ")")
    print('        |t(lang, n_train, n_contaminated, sum_shared)')
    print('        |ORDER BY lang""".stripMargin,')


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
