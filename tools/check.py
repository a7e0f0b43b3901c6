#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <outDir> <sfDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each query in outDir/oracle_sql.json: run the SQL in DuckDB over the
sfDir parquet tables, read the Spark result parquet, sort columns by
name, sort rows, and compare values (exact; floats via repr).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # spark-written table (e.g. a ScaleUp replica)
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            exp = norm(con.sql(sql).df())
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no output parquet")
                n_fail += 1
                continue
            got = norm(pd.concat([pd.read_parquet(f) for f in files]))
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {name}: cols exp={list(exp.columns)} got={list(got.columns)}")
                n_fail += 1
                continue
            if len(exp) != len(got):
                print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
                n_fail += 1
                continue
            # exact value compare, column by column
            bad = None
            for c in exp.columns:
                ev, gv = exp[c].tolist(), got[c].tolist()
                import decimal
                def canon(v):
                    if isinstance(v, (float, decimal.Decimal)):
                        return repr(float(v))
                    return str(v)
                for i, (a, b) in enumerate(zip(ev, gv)):
                    if canon(a) != canon(b):
                        bad = (c, i, a, b)
                        break
                if bad:
                    break
            if bad:
                print(f"FAIL {name}: col {bad[0]} row {bad[1]}: oracle={bad[2]!r} got={bad[3]!r}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(exp)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
