#!/usr/bin/env python3
"""Dispatch-parity compare for the sf1 forced-distributed sweep.

Usage: python3 tools/dispatch_parity.py <dirA> <dirB> [names]

Both dirs are graft.Verify output dirs over the SAME sf tables —
dirA from the default dispatch branches, dirB from
SPARK_GRAFT_FORCE_DISPATCH=distributed. The DuckDB oracle result is a
pure function of (sql, tables), so once dirA passes the oracle,
B == A proves the forced scale branches oracle-correct without paying
the DuckDB run twice — and covers queries whose oracle SQL is
infeasible at the scale grain (dbscan's density-pair CTE, the
golden-records band join). Same normalization as selfcheck.py:
sorted rows, sorted column names, exact values, signed zero visible.
"""
import sys

import duckdb

from selfcheck import norm  # same value normalization


def rows(con, path):
    rel = con.sql(f"SELECT * FROM '{path}/*.parquet'")
    cols = list(rel.columns)
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    data = sorted(tuple(norm(r[i]) for i in idx) for r in rel.fetchall())
    return [cols[i] for i in idx], [str(rel.types[i]) for i in idx], data


def main(dir_a, dir_b, names=None):
    import json, os
    con = duckdb.connect()
    oracle = json.load(open(f"{dir_a}/oracle_sql.json"))
    qs = sorted(oracle) if names is None else sorted(names)
    failures = 0
    for q in qs:
        if not (os.path.isdir(f"{dir_a}/{q}") and os.path.isdir(f"{dir_b}/{q}")):
            print(f"FAIL {q}: missing output dir")
            failures += 1
            continue
        ca, ta, ra = rows(con, f"{dir_a}/{q}")
        cb, tb, rb = rows(con, f"{dir_b}/{q}")
        if ca != cb:
            print(f"FAIL {q}: columns {cb} != {ca}")
            failures += 1
        elif ta != tb:
            print(f"FAIL {q}: types differ")
            failures += 1
        elif ra != rb:
            diffs = [(a, b) for a, b in zip(ra, rb) if a != b][:3]
            print(f"FAIL {q}: rows {len(rb)} vs {len(ra)}; first diffs: "
                  f"{diffs}" if len(ra) == len(rb) else
                  f"FAIL {q}: row count {len(rb)} != {len(ra)}")
            failures += 1
        else:
            print(f"OK   {q} ({len(ra)} rows)")
    print(f"{'PASS: 0 failures' if failures == 0 else f'FAIL: {failures} failures'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.path.insert(0, "tools")
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], names))
