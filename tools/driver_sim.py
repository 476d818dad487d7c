"""Simulate the driver's correctness gate: run every ``queries()`` entry and
its ``oracle_sql()`` twin (DuckDB over the same parquet tables) at a given
sf dir, comparing row count, schema (column names sorted) and a value hash
computed over column-name-sorted, row-sorted stringized values.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    payload = df.astype(str).to_csv(index=False)
    return hashlib.md5(payload.encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             log_to_driver=False)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        raise SystemExit(f"unknown query names: {sorted(unknown)}")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        entry = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "err": None}
        try:
            got = to_pandas(fn(sf_dir))
            entry["spark_rows"] = len(got)
            if name in sqls:
                exp = con.execute(sqls[name]).fetchdf()
                entry["oracle_rows"] = len(exp)
                entry["rows_match"] = len(got) == len(exp)
                entry["schema_match"] = sorted(got.columns) == sorted(exp.columns)
                entry["hash_match"] = (
                    entry["schema_match"] and value_hash(got) == value_hash(exp)
                )
                if not entry["hash_match"]:
                    entry["err"] = "mismatch"
            else:
                entry["err"] = "no_oracle"
        except Exception as e:  # noqa: BLE001
            entry["err"] = f"{type(e).__name__}: {e}"
        results[name] = entry
        # 'spark_rows' mirrors the driver's CORRECTNESS_r*.json key name
        status = "OK " if entry.get("hash_match") else (
            "ro " if entry["err"] == "no_oracle" else "FAIL"
        )
        print(f"{status} {name}: {entry}")
    ray.shutdown()

    bad = [n for n, e in results.items()
           if e["err"] not in (None, "no_oracle")]
    print(json.dumps({"bad": bad}, indent=1))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
