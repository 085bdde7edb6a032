#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate (SURVEY §2.4).

Reads the parquet results that `graft.Verify` dumped to OUT_DIR plus its
oracle_sql.json, runs each oracle statement in DuckDB over the same
scale-factor tables, and diffs the two result sets with columns sorted by
name (the driver compares that way). Exit code = number of mismatches.

Usage: python3 tools/oracle_check.py [SF_DIR] [OUT_DIR]
"""
import json
import math
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def rows_of(result):
    cols = [d[0] for d in result.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in result.fetchall():
        out.append("|".join(canon(row[i]) for i in order))
    return [cols[i] for i in order], out


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
    bad = 0
    for name in sorted(oracle):
        try:
            got_res = con.execute(
                f"SELECT * FROM read_parquet('{OUT_DIR}/{name}/*.parquet')")
            got_cols, got = rows_of(got_res)
        except Exception as ex:
            print(f"FAIL {name}: engine result unreadable: {ex}")
            bad += 1
            continue
        try:
            exp_cols, exp = rows_of(con.execute(oracle[name]))
        except Exception as ex:
            print(f"FAIL {name}: oracle errored: {ex}")
            bad += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            bad += 1
        elif got != exp:
            print(f"FAIL {name}: {len(got)} rows vs {len(exp)} rows")
            for i, (g, e) in enumerate(zip(got, exp)):
                if g != e:
                    print(f"  first diff @row {i}:\n    engine {g}\n    oracle {e}")
                    break
            if len(got) != len(exp):
                print(f"  engine[:2]={got[:2]}\n  oracle[:2]={exp[:2]}")
            bad += 1
        else:
            print(f"ok   {name}: {len(got)} rows")
    print(f"{len(oracle) - bad}/{len(oracle)} queries match")
    sys.exit(min(bad, 99))


if __name__ == "__main__":
    main()
