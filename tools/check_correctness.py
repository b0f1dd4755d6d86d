"""Local stand-in for the driver's correctness gate: runs every queries()
entry at sf0.01 side-by-side with its oracle_sql() DuckDB query and compares
row count, sorted column names, and an order-insensitive value hash.

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    raise TypeError(type(obj))


def norm_cell(x):
    if isinstance(x, float):
        return f"{x:.6g}"
    if x is None or x != x:
        return "<null>"
    return str(x)


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted("|".join(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ray_df = to_pandas(fn(SF_DIR))
        except Exception as e:
            print(f"FAIL {name}: ray side raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"WEAK {name}: rows={len(ray_df)} cols={sorted(ray_df.columns)} ({dt:.1f}s) [no oracle]")
            n_weak += 1
            continue
        try:
            ora_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(ray_df) != len(ora_df):
            problems.append(f"rows ray={len(ray_df)} oracle={len(ora_df)}")
        if sorted(map(str, ray_df.columns)) != sorted(map(str, ora_df.columns)):
            problems.append(f"cols ray={sorted(ray_df.columns)} oracle={sorted(ora_df.columns)}")
        elif value_hash(ray_df) != value_hash(ora_df):
            problems.append("value-hash mismatch")
            # show a sample diff
            a = ray_df[sorted(ray_df.columns)].astype(str).apply("|".join, axis=1).sort_values().reset_index(drop=True)
            b = ora_df[sorted(ora_df.columns)].astype(str).apply("|".join, axis=1).sort_values().reset_index(drop=True)
            if len(a) == len(b):
                neq = (a != b).idxmax() if (a != b).any() else None
                if neq is not None:
                    problems.append(f"first diff @{neq}: ray={a[neq]!r} oracle={b[neq]!r}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(ray_df)} ({dt:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
