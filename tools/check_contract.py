"""Local replica of the driver's correctness gate: run each queries()[name]
on Spark and oracle_sql()[name] on DuckDB at a given sf, compare row count,
schema (column names), and order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from linkgraph.session import get_spark

    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = E.queries(), E.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            t_spark = time.time() - t0
            if name not in oracles:
                results[name] = (f"ROWS_ONLY rows={len(sdf)}", t_spark, 0.0)
                print(f"{name:28s} ROWS_ONLY rows={len(sdf)}  spark={t_spark:.1f}s", flush=True)
                continue
            t1 = time.time()
            odf = con.sql(oracles[name]).df()
            t_duck = time.time() - t1
            a, b = normalize(sdf), normalize(odf)
            status = []
            if len(a) != len(b):
                status.append(f"ROWCOUNT {len(a)} vs {len(b)}")
            if list(a.columns) != list(b.columns):
                status.append(f"SCHEMA {list(a.columns)} vs {list(b.columns)}")
            if not status:
                if a.equals(b):
                    status.append("MATCH")
                else:
                    neq = (a != b) & ~(a.isna() & b.isna())
                    bad_cols = [c for c in a.columns if neq[c].any()]
                    status.append(f"VALUES differ in {bad_cols}")
                    for c in bad_cols[:2]:
                        i = neq[c].idxmax()
                        status.append(f"  e.g. row {i} {c}: {a[c][i]!r} vs {b[c][i]!r}")
            results[name] = ("; ".join(status), t_spark, t_duck)
            print(f"{name:28s} {'; '.join(status)}  spark={t_spark:.1f}s duck={t_duck:.1f}s", flush=True)
        except Exception as exc:
            results[name] = (f"ERROR {type(exc).__name__}: {exc}", 0, 0)
            print(f"{name:28s} ERROR {type(exc).__name__}: {str(exc)[:500]}", flush=True)
    spark.stop()
    bad = {k: v for k, v in results.items() if "MATCH" not in v[0] and "ROWS_ONLY" not in v[0]}
    print(f"\n{len(results) - len(bad)}/{len(results)} OK; failing: {sorted(bad)}", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
