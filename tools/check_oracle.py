#!/usr/bin/env python3
"""Mimic the driver's t2 correctness gate: for every query dumped by
graft.Verify, run the matching oracle SQL in DuckDB over the same parquet
tables and compare (columns sorted by name, rows sorted, values hashed).
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        canon_row = []
        for v in row:
            if isinstance(v, float):
                canon_row.append(round(v, 9))
            else:
                canon_row.append(str(v))
        out.append(tuple(canon_row))
    return sorted(out, key=repr)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noracle = 0
    # A declared oracle whose query never produced a result dir is a FAILED
    # query (graft.Verify catches per-query exceptions and moves on) — count
    # it, don't let the dir-driven loop silently skip it.
    dumped = {os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*"))
              if os.path.isdir(d)}
    for name in sorted(set(oracles) - dumped):
        n_fail += 1
        print(f"  [FAIL] {name}: declared oracle but no result dumped "
              f"(query threw in graft.Verify — see its stderr)")
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        got_rel = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        got_cols = sorted(got_rel.columns)
        got = con.sql(
            f"SELECT {', '.join(got_cols)} FROM got_rel").fetchall()
        if name not in oracles:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(got)} rows")
            if len(got) == 0:
                print(f"    !! EMPTY result")
            continue
        try:
            exp_rel = con.sql(oracles[name])
            exp_cols = sorted(exp_rel.columns)
            exp = con.sql(
                f"SELECT {', '.join(exp_cols)} FROM exp_rel").fetchall()
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL] {name}: oracle SQL error: {e}")
            continue
        if got_cols != exp_cols:
            n_fail += 1
            print(f"  [FAIL] {name}: columns {got_cols} != {exp_cols}")
            continue
        # type check (mimics schema compare)
        got_types = [str(t) for t in got_rel.types]
        exp_types = [str(t) for t in exp_rel.types]
        cg, ce = canon(got), canon(exp)
        if cg == ce:
            n_pass += 1
            tnote = "" if sorted(got_types) == sorted(exp_types) else \
                f"  (type diff: {got_types} vs {exp_types})"
            print(f"  [pass] {name}: {len(got)} rows{tnote}")
        else:
            n_fail += 1
            print(f"  [FAIL] {name}: {len(got)} vs {len(exp)} rows")
            diff = [(a, b) for a, b in zip(cg, ce) if a != b][:3]
            for a, b in diff:
                print(f"     got {a}\n     exp {b}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
