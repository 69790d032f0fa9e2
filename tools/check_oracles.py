"""Driver-style correctness check: run every queries() entry at a given sf
and compare against oracle_sql() via DuckDB (row count + schema-name +
order-insensitive value comparison). Usage:

    python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    raise TypeError(type(res))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ours: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    problems = []
    if list(sorted(ours.columns)) != list(sorted(oracle.columns)):
        problems.append(f"columns {sorted(ours.columns)} vs {sorted(oracle.columns)}")
        return problems
    if len(ours) != len(oracle):
        problems.append(f"rowcount {len(ours)} vs {len(oracle)}")
        return problems
    a, b = normalize(ours), normalize(oracle)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            ok = np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
            exact = np.array_equal(av.astype(float), bv.astype(float))
            if not exact:
                mx = np.max(np.abs(av.astype(float) - bv.astype(float)))
                problems.append(f"float col {c} not bit-exact (max abs diff {mx})")
        else:
            if not (av == bv).all():
                idx = np.nonzero(av != bv)[0][:3]
                problems.append(f"col {c} differs at rows {idx}: {av[idx]} vs {bv[idx]}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, sqls = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name not in sqls:
            print(f"ok   {name}: rows={len(ours)} ({dt:.1f}s) [rows-only]")
            continue
        try:
            oracle = con.execute(sqls[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised {ex}")
            failures += 1
            continue
        problems = compare(name, ours, oracle)
        if problems:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
            failures += 1
        else:
            print(f"ok   {name}: rows={len(ours)} ({dt:.1f}s) [oracle match]")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
