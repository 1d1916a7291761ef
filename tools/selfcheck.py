#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify's parquet
dumps, run each oracle SQL in DuckDB over the same fixture tables, and
compare column names (sorted), row counts, and values exactly.

Usage: selfcheck.py <sfDir> <outDir> [query ...]
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    declared = []
    if os.path.exists(f"{out_dir}/queries.json"):
        with open(f"{out_dir}/queries.json") as f:
            declared = json.load(f)
    n_pass = n_fail = n_skip = 0
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        if only and name not in only:
            continue
        spath = f"{out_dir}/{name}/*.parquet"
        try:
            got = con.execute(f"SELECT * FROM read_parquet('{spath}')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(got_rows)} rows)")
            n_skip += 1
            continue
        try:
            exp = con.execute(oracles[name])
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        bad = None
        for r, (g, e) in enumerate(zip(got_rows, exp_rows)):
            gs = tuple(norm(g[i]) for i in gi)
            es = tuple(norm(e[i]) for i in ei)
            if gs != es:
                bad = (r, gs, es)
                break
        if bad:
            r, gs, es = bad
            print(f"FAIL {name}: first diff at row {r}:")
            print(f"  cols  : {sorted(got_cols)}")
            print(f"  spark : {gs}")
            print(f"  duckdb: {es}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got_rows)} rows")
            n_pass += 1
    # declared queries with no output written (query crashed in Verify) —
    # covers oracle-less (rows-only) queries too via queries.json
    for name in set(oracles) | set(declared):
        if (not only or name in only) and name not in names:
            print(f"FAIL {name}: declared but no spark output present")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
