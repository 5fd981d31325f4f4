#!/usr/bin/env python3
"""Local self-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each <name> dir under verifyOutDir: load the Spark result parquet,
run oracle_sql.json[<name>] in DuckDB against the sf tables, sort columns
by name, sort rows, and compare cell-by-cell (exact; doubles also get a
rel-tol report so near-misses are visible before the real gate runs).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [cols[i] for i in idx], out


def cmp_cell(a, b):
    if a is None or b is None:
        return a is b, 0.0
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b), math.inf
        if math.isnan(fa) and math.isnan(fb):
            return True, 0.0
        d = abs(fa - fb)
        rel = d / max(abs(fa), abs(fb), 1e-300)
        return fa == fb, rel
    return a == b, 0.0 if a == b else math.inf


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols, grows = canon(got.fetchall(), got.columns)
            exp = con.sql(sql)
            ecols, erows = canon(exp.fetchall(), exp.columns)
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        # the driver's pandas comparator cannot hash/sort array cells
        # (q44 round-1 red row) — reject them here so the local recipe
        # never green-lights a query the real gate will fail. Checked on
        # the declared TYPES of both sides (not populated cells), so a
        # zero-row result at this sf cannot mask an array-typed column.
        arr_cols = sorted(
            {c for c, t in zip(got.columns, got.types)
             if any(k in str(t).upper() for k in ("LIST", "STRUCT", "MAP", "[]"))} |
            {c for c, t in zip(exp.columns, exp.types)
             if any(k in str(t).upper() for k in ("LIST", "STRUCT", "MAP", "[]"))})
        if arr_cols:
            print(f"FAIL {name}: array-typed result columns {arr_cols} "
                  f"(driver comparator rejects; serialize with array_join)")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            n_fail += 1
            continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows {len(grows)} != {len(erows)}")
            n_fail += 1
            continue
        bad = []
        worst_rel = 0.0
        for i, (gr, er) in enumerate(zip(grows, erows)):
            for j, (gv, ev) in enumerate(zip(gr, er)):
                ok, rel = cmp_cell(gv, ev)
                worst_rel = max(worst_rel, rel if rel != math.inf else 0)
                if not ok:
                    bad.append((i, gcols[j], gv, ev, rel))
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched cells; first: "
                  f"row={bad[0][0]} col={bad[0][1]} got={bad[0][2]!r} "
                  f"exp={bad[0][3]!r} rel={bad[0][4]:.2e}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows, worst_rel={worst_rel:.1e})")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
