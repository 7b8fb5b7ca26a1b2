#!/usr/bin/env python3
"""Independent oracle for l62_copy_pagerank.

Citation graph from the l55 span-provenance derivation (copier cites its
earliest source per shared 8-gram), then TEN rounds of the INTEGER
PageRank recurrence in micro-units:

  pr0(v) = 1_000_000
  share(c) = (pr(c) * 850) // (1000 * outdeg(c))
  pr'(v)  = 150_000 + sum(share(c) for c citing v)

Integer division and long sums make the fixpoint engine-exact
(dangling-node mass leaks, as documented in the query). Pure
DuckDB + Python — no graft code.

Usage: pin_l62.py <sfDir>
"""
import sys
from collections import defaultdict

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
edges = con.execute("""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(
    [w[i] || '_' || w[i+1] || '_' || w[i+2] || '_' || w[i+3] || '_'
      || w[i+4] || '_' || w[i+5] || '_' || w[i+6] || '_' || w[i+7]
     for i in generate_series(1, len(w) - 7)])) AS g FROM toks),
srcs AS (SELECT g, min(doc_id) AS src FROM sh GROUP BY g)
SELECT DISTINCT sh.doc_id AS citer, s2.src AS cited
FROM sh JOIN srcs s2 USING (g) WHERE sh.doc_id > s2.src""").fetchall()

ids = [r[0] for r in con.execute(
    "SELECT doc_id FROM documents ORDER BY doc_id").fetchall()]
out = defaultdict(list)
for citer, cited in edges:
    out[citer].append(cited)

pr = {v: 1_000_000 for v in ids}
for _ in range(10):
    nxt = {v: 150_000 for v in ids}
    for c, cites in out.items():
        share = (pr[c] * 850) // (1000 * len(cites))
        for v in cites:
            nxt[v] += share
    pr = nxt

rows = sorted(((p, v) for v, p in pr.items() if p > 150_000),
              key=lambda t: (-t[0], t[1]))
print('    "l62_copy_pagerank" ->')
print('      """SELECT * FROM (VALUES')
vals = [f"        |  (CAST({v} AS BIGINT), CAST({p} AS BIGINT))"
        for p, v in rows]
print(",\n".join(vals) + ")")
print('        |t(doc_id, pr_micros)')
print('        |ORDER BY pr_micros DESC, doc_id""".stripMargin,')
