#!/usr/bin/env python3
"""Independent oracle for l60_isotonic_calibration.

Reproduces the whole pipeline in DuckDB + pure-Python PAV:
  - per-doc stale flag (l53's rule: first-occurrence 5-gram credit
    covers less than half the doc's distinct shingles),
  - equal-width length decile over n_chars (value-based, engine-exact),
  - per-decile (n, stale) aggregate,
  - Pool-Adjacent-Violators for a NON-DECREASING stale rate, with all
    rate comparisons done by integer cross-multiplication and fitted
    rates as floor(1000 * pooled_pos / pooled_n).
Prints the VALUES oracle for LlmQueries.oracles.

Usage: pin_l60.py <sfDir>
"""
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

con = duckdb.connect()
con.execute(
    f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
rows = con.execute("""
WITH toks AS (SELECT doc_id, n_chars, string_split(text, ' ') AS w
  FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(
    [w[i] || '_' || w[i+1] || '_' || w[i+2] || '_' || w[i+3] || '_'
      || w[i+4] for i in generate_series(1, len(w) - 4)])) AS g
  FROM toks),
per AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
firsts AS (SELECT g, min(doc_id) AS doc_id FROM sh GROUP BY g),
own AS (SELECT doc_id, count(*) AS n_first FROM firsts GROUP BY 1),
mx AS (SELECT max(n_chars) AS m FROM documents),
lab AS (SELECT d.doc_id,
    (d.n_chars * 10) // (mx.m + 1) AS bucket,
    CASE WHEN coalesce(o.n_first, 0) * 2 < p.n_sh THEN 1 ELSE 0 END
      AS stale
  FROM documents d JOIN per p USING (doc_id)
  LEFT JOIN own o USING (doc_id), mx)
SELECT bucket, count(*) AS n, sum(stale) AS pos FROM lab
GROUP BY 1 ORDER BY 1""").fetchall()

# PAV: non-decreasing rate; compare by cross-multiplication.
blocks = []  # [buckets, n, pos]
for bucket, n, pos in rows:
    blocks.append([[bucket], n, pos])
    while len(blocks) >= 2 and \
            blocks[-1][2] * blocks[-2][1] < blocks[-2][2] * blocks[-1][1]:
        b = blocks.pop()
        blocks[-1][0] += b[0]
        blocks[-1][1] += b[1]
        blocks[-1][2] += b[2]

per_bucket = {}
for buckets, n, pos in blocks:
    fit = 1000 * pos // n
    for b in buckets:
        per_bucket[b] = fit
raw = {bucket: (n, pos) for bucket, n, pos in rows}

print('    "l60_isotonic_calibration" ->')
print('      """SELECT * FROM (VALUES')
vals = []
for b in sorted(raw):
    n, pos = raw[b]
    vals.append(f"        |  (CAST({b} AS BIGINT), CAST({n} AS BIGINT),"
                f" CAST({pos} AS BIGINT), CAST({per_bucket[b]} AS BIGINT))")
print(",\n".join(vals) + ")")
print('        |t(bucket, n, n_stale, fit_permille)')
print('        |ORDER BY bucket""".stripMargin,')
