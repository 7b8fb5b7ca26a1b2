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

        def tclass(t):
            """Normalized type label: differences WITHIN a label are
            representation detail (large vs small string, timestamp unit —
            same normalized value string); differences ACROSS labels
            (decimal vs int64, int32 vs int64, float32 vs float64…) are
            oracle/Spark typing bugs that can hash-mismatch under the
            driver even when the printed values agree."""
            if _pa.types.is_large_string(t) or _pa.types.is_string(t):
                return "string"
            if _pa.types.is_large_binary(t) or _pa.types.is_binary(t):
                return "binary"
            if _pa.types.is_timestamp(t):
                return "timestamp"
            if _pa.types.is_date(t):
                return "date"
            if _pa.types.is_list(t) or _pa.types.is_large_list(t):
                return f"list<{tclass(t.value_type)}>"
            if _pa.types.is_struct(t):
                inner = ",".join(
                    f"{t.field(i).name}:{tclass(t.field(i).type)}"
                    for i in range(t.num_fields))
                return f"struct<{inner}>"
            return str(t)  # int8/16/32/64, float/double, bool, decimal(p,s)…

        type_bugs = []
        for c in ocols:
            ot = odf.schema.field(c).type
            st = sdf.schema.field(c).type
            if tclass(ot) != tclass(st):
                type_bugs.append(f"{c}: oracle {ot} vs spark {st}")
        if type_bugs:
            print(f"FAIL {name}: oracle/spark dtype mismatch (add matching "
                  f"CASTs on both sides): {type_bugs}")
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


def selftest():
    """Prove the dtype guard fires: a Spark-side int64 column against an
    oracle that returns INTEGER (int32) must FAIL on type, not silently
    pass because str()-normalized values agree; the BIGINT twin must PASS.
    """
    import tempfile, os
    import pyarrow as pa
    import pyarrow.parquet as _pq
    d = tempfile.mkdtemp(prefix="check_oracles_selftest")
    sf = os.path.join(d, "sf"); os.makedirs(sf)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"COPY (SELECT 1 AS x) TO '{sf}/{t}.parquet' (FORMAT PARQUET)")
    out = os.path.join(d, "out")
    tbl = pa.table({"a": pa.array([1], type=pa.int64())})
    for q in ("t_mistyped", "t_ok"):
        os.makedirs(f"{out}/{q}")
        _pq.write_table(tbl, f"{out}/{q}/part-0.parquet")
    with open(f"{out}/oracle_sql.json", "w") as f:
        json.dump({"t_mistyped": "SELECT CAST(1 AS INTEGER) AS a",
                   "t_ok": "SELECT CAST(1 AS BIGINT) AS a"}, f)
    rc = main(sf, out)
    assert rc == 1, "selftest: mistyped oracle did not fail the gate"
    print("SELFTEST OK: int32-vs-int64 oracle flagged, bigint twin passed")
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
