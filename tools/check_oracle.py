#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the corresponding oracle SQL in
DuckDB against the same test tables and compare (columns sorted by name,
rows sorted, values compared exactly).

Usage: check_oracle.py <verifyOutDir> <sfDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols, got = canon(got_rel.fetchall(), got_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: cannot read result parquet: {e}")
            n_fail += 1
            continue
        try:
            exp_rel = con.sql(sql)
            exp_cols, exp = canon(exp_rel.fetchall(), exp_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            print("  got head:", got[:3])
            print("  exp head:", exp[:3])
            n_fail += 1
            continue
        bad = [(g, e) for g, e in zip(got, exp) if g != e]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(got)} value mismatches; first: got={bad[0][0]} exp={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows, cols={got_cols})")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
