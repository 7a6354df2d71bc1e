"""Local driver simulation: run each queries() entry next to its
oracle_sql() DuckDB statement over one sf dir and compare row count,
column names, and values (columns sorted by name, like the driver's
hash compare).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def _norm(df) -> pd.DataFrame:
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if len(a) != len(b):
        return f"rows {len(a)} vs {len(b)}"
    if list(a.columns) != list(b.columns):
        return f"cols {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = np.allclose(av.astype(np.float64), bv.astype(np.float64),
                             rtol=0, atol=0, equal_nan=True)
        else:
            ok = (av == bv).all() if len(av) else True
        if not ok:
            bad = np.flatnonzero(av != bv)[:5] if av.dtype == bv.dtype else []
            return f"values differ in {c} (first rows {list(bad)})"
    return None


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    qs, sqls = m.queries(), m.oracle_sql()
    names = sys.argv[2:] or [n for n in qs if n in sqls]
    fails = 0
    for name in names:
        try:
            got = _norm(qs[name](sf))
            if name not in sqls:
                print(f"{name:28s} rows={len(got)} (no oracle)")
                continue
            want = _norm(con.execute(sqls[name]).df())
            err = compare(got, want)
        except Exception as e:  # noqa: BLE001
            err = f"{type(e).__name__}: {e}"
        if err:
            fails += 1
            print(f"{name:28s} FAIL  {err}")
        else:
            print(f"{name:28s} ok    rows={len(got)}")
    print(f"SUMMARY: {len(names) - fails}/{len(names)} ok, {fails} FAIL")
    # ray.shutdown() after several hundred datasets occasionally hangs
    # (observed: all queries printed ok, process slept >30 min in
    # shutdown) — bound it and hard-exit so the sweep's exit code is
    # the verdict, not the teardown's luck
    import os
    import threading

    t = threading.Thread(target=ray.shutdown, daemon=True)
    t.start()
    t.join(timeout=60)
    sys.stdout.flush()
    os._exit(1 if fails else 0)


if __name__ == "__main__":
    sys.exit(main())
