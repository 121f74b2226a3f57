#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>
Where <verifyOutDir> was produced by `sbt "runMain graft.Verify <sfDir> <out>"`.

Dev tool only — NOT part of the shipped Scala library.
"""
import glob
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize to the driver's hash domain: sort columns by name,
    render every cell as its exact string form (so int 149174 vs float
    149174.0 DIFFER — DuckDB HUGEINT sums surface as float64 and must be
    CAST in the oracle SQL, not papered over here), then sort rows.
    The only dtype normalization kept is timestamps → µs, which round-1
    driver results prove both engines already agree on.
    """
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]")
        df[c] = df[c].map(lambda v: str(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> str:
    if sorted(got.columns) != sorted(exp.columns):
        return f"columns differ: spark={sorted(got.columns)} oracle={sorted(exp.columns)}"
    g, e = norm(got), norm(exp)
    if len(g) != len(e):
        return f"row counts differ: spark={len(g)} oracle={len(e)}"
    for c in g.columns:
        gv, ev = g[c].to_numpy(), e[c].to_numpy()
        neq = gv != ev
        if neq.any():
            bad = int(np.argmax(neq))
            return f"column {c} differs (e.g. row {bad}: spark={gv[bad]!r} oracle={ev[bad]!r})"
    return ""


def main() -> None:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    # optional 3rd arg: comma-separated query names (resume/heavy-query runs)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    import os
    # bound the spill so a pathological plan errors instead of filling the
    # disk (the sf1ev q252 lesson: 200+ GB of temp before ENOSPC).
    # Optional capacity knobs for heavy-SF sweeps (the r17 sf0.1 full-surface
    # run used THREADS=8 + no insertion order + 70GiB): DuckDB hash-join
    # memory scales with thread count, so fewer threads = less memory.
    con.execute(f"SET max_temp_directory_size='{os.environ.get('DUCKDB_SPILL', '40GiB')}'")
    if 'DUCKDB_THREADS' in os.environ:
        con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
    if os.environ.get('DUCKDB_NO_ORDER') == '1':
        con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        # driver testdata ships single-file tables; ScaleGen replicas are
        # Spark-written DIRECTORIES of part files — glob those
        src = f"{sfdir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_fail = 0
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL error: {exc}")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
        msg = compare(name, got, exp)
        if msg:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
    print(f"{len(oracle) - n_fail}/{len(oracle)} oracle queries match")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
