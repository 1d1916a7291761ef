#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify's parquet
dumps, run each oracle SQL in DuckDB over the same fixture tables, and
compare column names (sorted), row counts, and values.

Mirrors the driver's stricter semantics (learned in round 2):
  * columns are sorted by name, then ROWS are sorted by all columns
    (the driver sort_values-es every column before hashing);
  * value comparison is dtype-strict — an int on one side and a float
    on the other is a FAIL even when numerically equal (the driver
    hashes formatted values, so 1 != 1.0);
  * non-scalar output columns (LIST/STRUCT/MAP) in an oracle-backed
    query are a FAIL outright — the driver's pandas sort step raises
    `unhashable type: numpy.ndarray` on them.

Usage: selfcheck.py <sfDir> <outDir> [query ...]
"""
import sys, os, json, math
from decimal import Decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

NONSCALAR = ("[]", "STRUCT", "MAP", "LIST", "UNION")


def bad_types(cols_types):
    return [f"{c}:{t}" for c, t in cols_types
            if any(m in t.upper() for m in NONSCALAR)]


def is_float(v):
    return isinstance(v, float)


def is_int(v):
    return isinstance(v, int) and not isinstance(v, bool)


def veq(a, b):
    """Dtype-strict scalar equality (int vs float mismatch = fail)."""
    if a is None or b is None:
        return a is None and b is None
    # Decimal vs float IS a dtype mismatch (the driver hashes formatted
    # values, so '1.000000' vs '1.0' would fail there — fail here too)
    if isinstance(a, Decimal) != isinstance(b, Decimal):
        return False
    if isinstance(a, Decimal) and isinstance(b, Decimal):
        return a == b
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if is_int(a) != is_int(b) or is_float(a) != is_float(b):
        return False
    if is_float(a) and is_float(b) and math.isnan(a) and math.isnan(b):
        return True
    return a == b


def sort_key(row):
    # deterministic total order over heterogeneous scalar tuples
    return tuple((v is None, type(v).__name__, str(v)) for v in row)


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
            got_types = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{spath}')").fetchall()
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
        bad_spark = bad_types([(r[0], r[1]) for r in got_types])
        if bad_spark:
            print(f"FAIL {name}: non-scalar spark output columns {bad_spark} "
                  "(driver comparator cannot sort/hash these)")
            n_fail += 1
            continue
        try:
            exp_types = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            exp = con.execute(oracles[name])
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        bad_oracle = bad_types([(r[0], r[1]) for r in exp_types])
        if bad_oracle:
            print(f"FAIL {name}: non-scalar oracle columns {bad_oracle}")
            n_fail += 1
            continue
        # HUGEINT escapes the dtype-strict veq (duckdb fetchall() yields
        # plain ints) but the driver's pandas conversion maps it to float64,
        # so the formatted-value hash diverges from Spark's int64 ('3.0' vs
        # '3'). Fail here so it can't pass locally and fail in the driver.
        huge = [f"{r[0]}:{r[1]}" for r in exp_types
                if "HUGEINT" in r[1].upper()]
        if huge:
            print(f"FAIL {name}: oracle columns {huge} are HUGEINT — the "
                  "driver formats these as float64; CAST them to BIGINT")
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
        # driver: sort columns by name, then sort rows by all columns
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        gsorted = sorted((tuple(r[i] for i in gi) for r in got_rows), key=sort_key)
        esorted = sorted((tuple(r[i] for i in ei) for r in exp_rows), key=sort_key)
        bad = None
        for r, (g, e) in enumerate(zip(gsorted, esorted)):
            if not all(veq(a, b) for a, b in zip(g, e)):
                bad = (r, g, e)
                break
        if bad:
            r, gs, es = bad
            print(f"FAIL {name}: first diff at sorted row {r}:")
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
