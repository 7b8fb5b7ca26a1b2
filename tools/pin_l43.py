#!/usr/bin/env python3
"""Independent reimplementation of l43_tokenize_pack for oracle pinning.

Composition of l39's BPE encode and l27's sequence packing: per-doc BPE
token totals (8 learned merges, via pin_l39.word_token_counts), then pack
docs in doc_id order into 512-token sequences (seq_id = floor(cumulative
token start / 512)), and summarize: number of sequences, docs, tokens,
the max docs packed into one sequence, and a seq_id-weighted checksum.

Usage: pin_l43.py <sfDir>   -> prints the DuckDB VALUES oracle
"""
import sys

sys.path.insert(0, __import__("os").path.dirname(__file__))
from pin_l39 import word_token_counts

BUDGET = 512


def main(sf_dir):
    ntok, t = word_token_counts(sf_dir)
    docs = sorted(zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist()))
    seq_docs = {}
    start = 0
    for doc_id, text in docs:
        toks = sum(ntok[w] for w in text.split(" "))
        sid = start // BUDGET
        seq_docs.setdefault(sid, [0, 0])
        seq_docs[sid][0] += 1
        seq_docs[sid][1] += toks
        start += toks
    n_seqs = len(seq_docs)
    n_docs = sum(v[0] for v in seq_docs.values())
    sum_tokens = sum(v[1] for v in seq_docs.values())
    max_docs = max(v[0] for v in seq_docs.values())
    checksum = sum(sid * v[0] for sid, v in seq_docs.items())
    print('    "l43_tokenize_pack" ->')
    print('      """SELECT * FROM (VALUES')
    print(f"        |  (CAST({n_seqs} AS BIGINT), CAST({n_docs} AS BIGINT),"
          f" CAST({sum_tokens} AS BIGINT), CAST({max_docs} AS BIGINT),"
          f" CAST({checksum} AS BIGINT)))")
    print('        |t(n_seqs, n_docs, sum_tokens, max_docs_per_seq,'
          ' seq_checksum)""".stripMargin,')


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
