#!/usr/bin/env python3
"""Local pre-check of SparkEntry.queries vs their DuckDB oracles.

Mimics the driver's correctness gate: runs each oracle SQL in DuckDB over
the same parquet tables, loads the Spark parquet output from Verify, sorts
columns by name and rows by value, and compares.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    import pyarrow as pa
    tabs = [pq.read_table(f) for f in files]
    return pa.concat_tables(tabs)


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        spark_tab = load_spark(outdir, name)
        if spark_tab is None:
            print(f"FAIL {name}: no spark output")
            failed.append(name)
            continue
        try:
            res = con.execute(sql)
            duck_rows = res.fetchall()
            duck_cols = [d[0] for d in res.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failed.append(name)
            continue
        spark_cols = spark_tab.column_names
        spark_rows = list(zip(*[spark_tab.column(c).to_pylist() for c in spark_cols])) if spark_tab.num_rows else []
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            failed.append(name)
            continue
        a = canon(spark_rows, spark_cols)
        b = canon(duck_rows, duck_cols)
        if a == b:
            print(f"PASS {name}: {len(a)} rows")
        else:
            print(f"FAIL {name}: spark {len(a)} rows vs duck {len(b)} rows")
            sa, sb = set(a), set(b)
            for r in list(sa - sb)[:5]:
                print(f"   spark-only: {r}")
            for r in list(sb - sa)[:5]:
                print(f"   duck-only:  {r}")
            failed.append(name)
    print("FAILED:", failed if failed else "none")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
