#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the sf parquet tables,
and compares row count, column names, and values (sorted rows, sorted column
names, exact match after string normalization; floats compared exactly —
queries are expected to round on both sides).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0"  # signed zero is hash-visible to the driver
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

def table(rows, cols, types):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in idx) for r in rows]
    return sorted(out), [cols[i] for i in idx], [types[i] for i in idx]

# Both sides are read through DuckDB, so dtype names are comparable directly;
# the driver's hash compare is type-sensitive, so any mismatch here (notably
# INT32 vs BIGINT) is a real failure even when stringified values agree.
# NB: DBAPI cursor description[1] collapses every numeric to 'NUMBER', so we
# go through con.sql(...) relations, whose .types carry the logical type.

def main(sf_dir, out_dir):
    con = duckdb.connect()
    import os
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver testdata ships single files; ScaleUpGen/FuzzGen write
        # Spark part-file directories — glob those for DuckDB
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # optional 3rd arg: comma-separated query names (builder-local
    # iteration / splitting a slow oracle off a long sweep)
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in only}
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols_raw = list(got_rel.columns)
            got_types_raw = [str(t) for t in got_rel.types]
            got_rows = got_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        try:
            exp_rel = con.sql(sql)
            exp_cols_raw = list(exp_rel.columns)
            exp_types_raw = [str(t) for t in exp_rel.types]
            exp_rows = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        got, gc, gt = table(got_rows, got_cols_raw, got_types_raw)
        exp, ec, et = table(exp_rows, exp_cols_raw, exp_types_raw)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            failures += 1
        elif gt != et:
            diffs = [(c, g, e) for c, g, e in zip(gc, gt, et) if g != e]
            print(f"FAIL {name}: column types differ: {diffs}")
            failures += 1
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
        elif got != exp:
            bad = [(g, e) for g, e in zip(got, exp) if g != e][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            failures += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    # rows-only queries (no oracle); respects the optional name filter —
    # without this, a single-query invocation (the per-query skew-oracle
    # loop) would print every OTHER dumped query as a bogus rows-only OK
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if len(sys.argv) > 3 and name not in only:
            continue
        if os.path.isdir(p) and name not in oracle:
            try:
                n = con.execute(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
                print(f"OK   {name} (rows-only: {n} rows)")
            except Exception as e:
                print(f"FAIL {name}: rows-only unreadable: {e}")
                failures += 1
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {failures} failures")
    return 1 if failures else 0

def selftest():
    # A planted -0.0 vs +0.0 divergence MUST be visible (driver hashes
    # the sign bit; a norm() blind to it makes this gate softer than the
    # driver's — the exact class that slipped q396 through round 8).
    assert norm(-0.0) != norm(0.0), "norm() is blind to signed zero"
    assert norm(-0.0) == "-0" and norm(0.0) == "0"
    assert norm(float("nan")) == "NaN" and norm(None) == "NULL"
    assert norm(2.0) == "2" and norm(2.5) == "2.5"
    print("selftest OK")
    return 0

if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
