#!/usr/bin/env python3
"""Oracle RESULT-TYPE lint (SURVEY §2.4's canonicalization contract).

The driver hashes oracle results through a TYPED canonicalization
(Arrow), so a DuckDB result column that types as HUGEINT or DECIMAL
diverges from Spark's BIGINT/DOUBLE even when every VALUE matches —
exactly how `catalog_generated` shipped hash-red two rounds running
(DuckDB `SUM(BIGINT)` returns HUGEINT; rounds 11-12). This lint runs
`DESCRIBE (<oracle sql>)` for every declared oracle — DuckDB plans but
does NOT execute, so the full inventory lints in seconds — and fails
on any result column whose type falls outside the canonical set the
Spark side can produce.

Usage: python3 tools/oracle_type_lint.py [SF_DIR] [ORACLE_JSON]
Exit code = number of offending queries (capped at 99).
"""
import json
import re
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ORACLE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# Spark-producible result types (graft.Canonical's contract): anything
# else — HUGEINT above all — will hash-diverge in the driver's typed
# compare even with identical values. Nested types are allowed over
# the same element domain (a Spark array<...> round-trips exactly).
ALLOWED = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
           "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP", "TIMESTAMP_NS",
           "TIME", "BLOB"}


def base_types(t):
    """Atomic type names inside a possibly-nested DuckDB type string."""
    # STRUCT(a BIGINT, b VARCHAR)[] / MAP(VARCHAR, DOUBLE) / BIGINT[]
    return set(re.findall(r"[A-Z_]+(?:\(\d+(?:,\d+)?\))?",
                          t.replace("[]", "")))


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    oracle = json.load(open(ORACLE))
    bad = 0
    for name in sorted(oracle):
        try:
            cols = con.execute(f"DESCRIBE ({oracle[name]})").fetchall()
        except Exception as ex:
            print(f"FAIL {name}: DESCRIBE errored: {ex}")
            bad += 1
            continue
        offending = []
        for col, typ, *_ in cols:
            atoms = base_types(typ)
            # STRUCT/MAP are container keywords, not value types
            atoms -= {"STRUCT", "MAP", "UNION"}
            stripped = {re.sub(r"\(.*", "", a) for a in atoms}
            if not stripped <= {re.sub(r"\(.*", "", a) for a in ALLOWED}:
                offending.append(f"{col}: {typ}")
        if offending:
            print(f"FAIL {name}: non-canonical result type(s) "
                  f"{offending} — CAST the column (HUGEINT/DECIMAL "
                  f"hash-diverge from Spark; see graft.Canonical)")
            bad += 1
    print(f"{len(oracle) - bad}/{len(oracle)} oracles type-clean")
    sys.exit(min(bad, 99))


if __name__ == "__main__":
    main()
