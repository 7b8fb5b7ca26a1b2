#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB over the
parquet tables in <sfDir>, loads the Spark result parquet from
<verifyOutDir>/<name>/, and compares (rows, schema-ish, values) with
columns sorted by name and rows sorted by all columns.
"""
import sys, json, glob, math

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def rows_key(rows):
    return sorted([tuple(norm(v) for v in r) for r in rows])


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        # Check for spark output BEFORE running the oracle SQL: under
        # SPARK_GRAFT_ONLY subsets most entries have none, and some
        # oracles (exact pair joins) are quadratic in DuckDB at sf0.1.
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            odf = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        import pyarrow as pa
        sdf = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
        ocols = sorted(odf.column_names)
        scols = sorted(sdf.column_names)
        if ocols != scols:
            print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        # Type-level guard: the driver's hash is type-sensitive. DuckDB
        # sum(BIGINT) returns HUGEINT -> arrow decimal128(38,0), which
        # hash-mismatches Spark's int64 even when values are identical.
        # Flag any decimal oracle column whose Spark twin is not decimal
        # as an oracle bug (missing CAST(... AS BIGINT)), so the class
        # cannot ship again just because str()-normalized values agree.
        import pyarrow as _pa
        type_bugs = []
        for c in ocols:
            ot = odf.schema.field(c).type
            st = sdf.schema.field(c).type
            if _pa.types.is_decimal(ot) and not _pa.types.is_decimal(st):
                type_bugs.append(f"{c}: oracle {ot} vs spark {st}")
        if type_bugs:
            print(f"FAIL {name}: oracle type bug (missing CAST AS BIGINT?): "
                  f"{type_bugs}")
            n_fail += 1
            continue
        orows = rows_key(zip(*[odf.column(c).to_pylist() for c in ocols])) if odf.num_rows else []
        srows = rows_key(zip(*[sdf.column(c).to_pylist() for c in scols])) if sdf.num_rows else []
        if len(orows) != len(srows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        if orows != srows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs (spark vs oracle): {diffs}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
