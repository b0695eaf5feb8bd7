#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares each
<outDir>/<name> parquet against its DuckDB oracle from oracle_sql.json.

Usage: python3 scripts/local_verify.py <sfDir> <outDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(round(v, 9) if isinstance(v, float) else v
                         for v in (r[i] for i in order)))
    out.sort(key=repr)
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [c.lower() for c in got_rel.columns]
            got = normalize(got_rel.fetchall(), got_cols)
            want_rel = con.sql(sql)
            want_cols = [c.lower() for c in want_rel.columns]
            want = normalize(want_rel.fetchall(), want_cols)
            if sorted(got_cols) != sorted(want_cols):
                print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
                n_fail += 1
            elif got != want:
                print(f"FAIL {name}: {len(got)} rows vs {len(want)} rows; "
                      f"first diff: {next(((a, b) for a, b in zip(got, want) if a != b), ('<len>', '<len>'))}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
