#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev tool only —
the Scala library does not depend on this). Usage:

    python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

For each <name>/ parquet dump in verify_out_dir with an entry in
oracle_sql.json: run the SQL in DuckDB with views over the sf_dir parquet
tables, then compare (schema names, row count, sorted-row multiset) against
the Spark result. Reports per-query PASS/FAIL with a diff sample.
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        out.append(tuple(
            tuple(v) if isinstance(v, list) else v for v in row))
    out.sort(key=repr)
    return out


def norm_type(t):
    # Normalize to the driver's observed hash-equivalence classes
    # (round 1: INT-vs-BIGINT and DOUBLE-vs-DECIMAL skews passed its
    # compare; HUGEINT, i.e. uncast DuckDB integer sum(), failed).
    t = str(t)
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
        return "int64"
    if t in ("FLOAT", "DOUBLE") or t.startswith("DECIMAL"):
        return "float"
    return t


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        # partial dumps (SPARK_GRAFT_ONLY iteration) have no dir at all —
        # distinct from a failed write, which Verify deletes after logging
        if not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1
            continue
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got_rel.columns)
            got = canon(con.sql(
                f"SELECT {', '.join(got_cols)} FROM got_rel").fetchall())
            exp_rel = con.sql(sql)
            exp_cols = sorted(exp_rel.columns)
            exp = canon(con.sql(
                f"SELECT {', '.join(exp_cols)} FROM exp_rel").fetchall())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        got_types = dict(zip(got_rel.columns,
                             (norm_type(t) for t in got_rel.types)))
        exp_types = dict(zip(exp_rel.columns,
                             (norm_type(t) for t in exp_rel.types)))
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} vs {exp_cols}")
            n_fail += 1
        elif got_types != exp_types:
            # The driver hashes typed values (e.g. DuckDB HUGEINT sum() vs
            # Spark BIGINT) — a type skew fails its compare even when the
            # Python values are equal.
            diff = {c: (got_types[c], exp_types[c]) for c in got_types
                    if got_types[c] != exp_types.get(c)}
            print(f"FAIL {name}: column types spark-vs-oracle {diff}")
            n_fail += 1
        elif got != exp:
            only_got = [r for r in got if r not in set(exp)][:3]
            only_exp = [r for r in exp if r not in set(got)][:3]
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}; "
                  f"spark-only={only_got} oracle-only={only_exp}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail"
          + (f" ({n_skip} not dumped)" if n_skip else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
