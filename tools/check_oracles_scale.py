#!/usr/bin/env python3
"""sf≈1 oracle verification harness (the r15 verdict's #3 task).

Runs the DuckDB oracle for a named heavy-query subset against a ScaleGen
replica dir and a Verify output dir, timing BOTH the oracle SQL and the
compare, and writes a CORRECTNESS_sf1ev.json-shaped artifact:
  {query: {status: pass|FAIL|error, rows, oracle_s, detail}}

Dev tool only — NOT part of the shipped Scala library.
Usage: python3 tools/check_oracles_scale.py <sfDir> <verifyOutDir> <outJson> [names]

Env knobs (the r16 capacity findings — the three OOM rows q249/q252/q261
were DuckDB hash-join memory at default settings, not plan impossibility):
  DUCKDB_THREADS     worker threads (default 8; hash-join memory scales
                     with thread count, so FEWER threads = less memory)
  DUCKDB_SPILL       max_temp_directory_size (default '70GiB')
Queries whose generated text is `<WITH ...> SELECT ... UNION ALL SELECT`
(q261's per-scheme sweep) are additionally DECOMPOSED: each top-level
branch runs as its own statement (unreferenced CTEs are lazy, so each run
plans only its scheme's pipeline) and the branch frames concatenate —
UNION ALL is order-insensitive under the sorted compare.
"""
import glob
import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(__file__))
from check_oracles import TABLES, compare  # noqa: E402


# queries whose generated oracle is a top-level UNION ALL of independent
# sweep branches (safe to run branch-at-a-time to bound DuckDB memory).
# Allowlisted by NAME: a future oracle with a UNION ALL inside a CTE body
# must NOT be decomposed mid-CTE into broken SQL (review finding r17).
BRANCH_SPLIT_QUERIES = {"q261_lsh_band_sweep"}


def branch_split(name: str, sql: str):
    """Top-level UNION ALL branches of the generated sweep shape, each a
    standalone query re-carrying the WITH prefix. Returns [sql] unless
    `name` is allowlisted and the marker is present (single-pipeline
    oracles run unchanged)."""
    marker = "\nUNION ALL\n"
    if name not in BRANCH_SPLIT_QUERIES or marker not in sql:
        return [sql]
    head, *rest = sql.split(marker)
    # the first branch ends where the WITH prefix's final SELECT begins;
    # every later branch is a bare SELECT needing the shared prefix
    cut = head.rindex("SELECT")
    prefix, first = head[:cut], head[cut:]
    return [prefix + first] + [prefix + b for b in rest]


def main() -> None:
    sfdir, outdir, outjson = sys.argv[1], sys.argv[2], sys.argv[3]
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    con = duckdb.connect()
    con.execute(f"SET max_temp_directory_size='{os.environ.get('DUCKDB_SPILL', '70GiB')}'")
    con.execute(f"SET threads={int(os.environ.get('DUCKDB_THREADS', '8'))}")
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        src = f"{sfdir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    results = {}
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            results[name] = {"status": "error", "detail": "no spark output"}
            print(f"ERR  {name}: no spark output", flush=True)
            continue
        t0 = time.time()
        try:
            parts = branch_split(name, oracle[name])
            exp = pd.concat([con.execute(p).df() for p in parts],
                            ignore_index=True)
        except Exception as exc:  # noqa: BLE001
            results[name] = {"status": "error",
                             "detail": f"oracle SQL error: {exc}"[:400],
                             "oracle_s": round(time.time() - t0, 1)}
            print(f"ERR  {name}: {exc}", flush=True)
            continue
        oracle_s = round(time.time() - t0, 2)
        got = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
        msg = compare(name, got, exp)
        if msg:
            results[name] = {"status": "FAIL", "detail": msg,
                             "rows": len(got), "oracle_s": oracle_s}
            print(f"FAIL {name}: {msg}", flush=True)
        else:
            results[name] = {"status": "pass", "rows": len(got),
                             "oracle_s": oracle_s}
            print(f"ok   {name} ({len(got)} rows, oracle {oracle_s}s)", flush=True)
    n_pass = sum(1 for r in results.values() if r["status"] == "pass")
    artifact = {
        "sf_dir": sfdir, "queries": results,
        "n_pass": n_pass, "n_total": len(results),
    }
    with open(outjson, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"{n_pass}/{len(results)} pass -> {outjson}")
    sys.exit(0 if n_pass == len(results) else 1)


if __name__ == "__main__":
    main()
