#!/usr/bin/env python
"""Simulate the round driver's CORRECTNESS protocol locally.

For every queries() entry with an oracle_sql() twin (or the first N with
--prefix), runs the Ray pipeline AND the DuckDB oracle at sf0.01 and
compares exactly the way the driver does: sort columns by name, sort rows
by all columns, hash the values. Prints one line per query and a final
FAILURES list — run this before a round ends to know CORRECTNESS_r{N}
will be green.

Usage:  python scripts/sim_correctness.py [--prefix 50] [--sf DIR]
"""

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import pyarrow as pa


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def vhash(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False, float_format="%.6g").encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prefix", type=int, default=0, help="check only the first N queries")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as m

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")
    Q, O = m.queries(), m.oracle_sql()
    names = list(Q)[: args.prefix] if args.prefix else [n for n in Q if n in O]
    fails = []
    for i, name in enumerate(names):
        try:
            r = Q[name](args.sf)
            g = r.to_pandas() if not isinstance(r, pd.DataFrame) else r
            if name not in O:
                print(f"{i:3d} {name}: rows_only rows={len(g)}")
                continue
            w = con.sql(O[name]).df()
            gn, wn = norm(g), norm(w)
            ok = (
                len(gn) == len(wn)
                and list(gn.columns) == list(wn.columns)
                and vhash(gn) == vhash(wn)
            )
            print(f"{i:3d} {name}: {'PASS' if ok else 'FAIL'} ({len(gn)})")
            if not ok:
                fails.append(name)
        except Exception as e:  # keep sweeping; report at the end
            fails.append(name)
            print(f"{i:3d} {name}: ERROR {type(e).__name__}: {e}")
    ray.shutdown()
    print("FAILURES:", fails if fails else "none")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
