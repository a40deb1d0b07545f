#!/usr/bin/env python3
"""Pins that the q32 oracle's recursive-closure component-min form
discriminates chain-shaped components, where the old NOT-IN pair form
silently agreed with the engine only on pair-shaped components.

Usage: python3 tools/oracle_chain_check.py   (exits 0 iff all checks pass)

The engine's semantics (Dedup.embeddingDedup): cosine pairs -> connected
components -> keep the minimum id per component. On pairs (1,3),(2,3) —
a chain where node 2 is never an id_b — the correct answer keeps {1} and
the isolated nodes; the NOT-IN form wrongly keeps {1,2}. This script
replays both final-select forms over the same pair CTE in DuckDB and
asserts the closure form matches ground-truth union-find on several
component shapes while the NOT-IN form fails the chain.
"""
import sys
import duckdb


def closure_keep(pairs, nodes):
    """The q32 oracle's recursive reachable-min form."""
    con = duckdb.connect()
    con.execute("CREATE TABLE pairs(id_a BIGINT, id_b BIGINT)")
    con.executemany("INSERT INTO pairs VALUES (?, ?)", pairs or [(None, None)])
    if not pairs:
        con.execute("DELETE FROM pairs")
    con.execute("CREATE TABLE vecs(vec_id BIGINT)")
    con.executemany("INSERT INTO vecs VALUES (?)", [(n,) for n in nodes])
    rows = con.execute("""
        WITH RECURSIVE
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
        reach AS (SELECT vec_id AS id, vec_id AS r FROM vecs
                  UNION
                  SELECT t.id, e.v FROM reach t JOIN edges e ON e.u = t.r)
        SELECT id FROM reach GROUP BY id HAVING id = min(r) ORDER BY id
        """).fetchall()
    return sorted(r[0] for r in rows)


def notin_keep(pairs, nodes):
    """The retired NOT-IN pair form."""
    con = duckdb.connect()
    con.execute("CREATE TABLE pairs(id_a BIGINT, id_b BIGINT)")
    con.executemany("INSERT INTO pairs VALUES (?, ?)", pairs or [(None, None)])
    if not pairs:
        con.execute("DELETE FROM pairs")
    con.execute("CREATE TABLE vecs(vec_id BIGINT)")
    con.executemany("INSERT INTO vecs VALUES (?)", [(n,) for n in nodes])
    rows = con.execute("""
        SELECT vec_id FROM vecs
        WHERE vec_id NOT IN (SELECT id_b FROM pairs) ORDER BY vec_id
        """).fetchall()
    return sorted(r[0] for r in rows)


def union_find_keep(pairs, nodes):
    """Ground truth: component minimum per node."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return sorted(m for r, m in comp_min.items())


def main():
    cases = {
        "isolated": ([], [1, 2, 3]),
        "simple_pair": ([(1, 2)], [1, 2, 3]),
        "chain_via_hub": ([(1, 3), (2, 3)], [1, 2, 3, 4]),
        "long_chain": ([(1, 3), (2, 3), (2, 5), (4, 5)], [1, 2, 3, 4, 5, 6]),
        "two_components": ([(1, 2), (3, 4)], [1, 2, 3, 4, 5]),
        "clique": ([(1, 2), (1, 3), (2, 3)], [1, 2, 3]),
    }
    failures = []
    notin_diverges = False
    for name, (pairs, nodes) in cases.items():
        truth = union_find_keep(pairs, nodes)
        got = closure_keep(pairs, nodes)
        if got != truth:
            failures.append(f"{name}: closure={got} truth={truth}")
        if notin_keep(pairs, nodes) != truth:
            notin_diverges = True
        print(f"{name}: closure={got} notin={notin_keep(pairs, nodes)} "
              f"truth={truth}")
    if not notin_diverges:
        failures.append("NOT-IN form never diverged — the check is vacuous")
    if failures:
        print("FAIL:\n  " + "\n  ".join(failures))
        return 1
    print("PASS: closure form == union-find on all shapes; "
          "NOT-IN form diverges on chains (discrimination proven)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
