"""Local mirror of the driver's correctness gate.

Runs each ``__ray_entry__.queries()`` pipeline AND its ``oracle_sql()``
DuckDB mirror over the same parquet tables, then compares row count,
schema (column names) and values (columns sorted by name, rows sorted by
all columns). Usage:

    python tools/oracle_check.py [sf_dir] [query ...]

Defaults to /root/testdata/sf0.01 and all queries.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        try:
            df = res.to_pandas()
            if len(df.columns) == 0 and hasattr(res, "schema"):
                # Ray 2.49 drops column names in to_pandas() when every
                # block is empty; rebuild the typed empty frame from the
                # dataset schema so 0-row results keep their schema
                sch = res.schema(fetch_if_missing=True)
                base = getattr(sch, "base_schema", None)
                if base is not None:
                    df = base.empty_table().to_pandas()
            return df
        except TypeError:
            pass
    if hasattr(res, "iter_batches"):  # Dataset
        import pyarrow as pa

        batches = list(res.iter_batches(batch_format="pyarrow"))
        return (
            pa.concat_tables(batches, promote_options="default").to_pandas()
            if batches
            else pd.DataFrame()
        )
    return pd.DataFrame(res)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, ora_df: pd.DataFrame) -> dict:
    out = {"rows_match": len(ray_df) == len(ora_df)}
    a, b = canon(ray_df), canon(ora_df)
    out["schema_match"] = list(a.columns) == list(b.columns)
    if not (out["rows_match"] and out["schema_match"]):
        out["hash_match"] = False
        return out
    ok = True
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            col_ok = np.allclose(
                av.astype(np.float64), bv.astype(np.float64),
                rtol=0, atol=0, equal_nan=True,
            )
        else:
            col_ok = a[c].equals(b[c])  # pandas: NaT/NaN compare equal
            if not col_ok:
                try:
                    col_ok = bool(np.array_equal(av, bv))
                except Exception:
                    col_ok = list(av) == list(bv)
        if not col_ok:
            ok = False
            bad = None
            try:
                neq = np.flatnonzero(av != bv)
                bad = [(int(i), av[i], bv[i]) for i in neq[:3]]
            except Exception:
                pass
            print(f"  [{name}] col {c} differs; first diffs: {bad}")
    out["hash_match"] = ok
    return out


def main() -> None:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv and os.path.isdir(argv[0]) else "/root/testdata/sf0.01"
    only = [a for a in argv if not os.path.isdir(a)]

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = only or list(queries)
    failures = []
    records: dict[str, dict] = {}
    import time

    for name in names:
        t0 = time.perf_counter()
        try:
            ray_df = to_pandas(queries[name](sf_dir))
        except Exception as e:
            print(f"{name}: RAY ERROR {type(e).__name__}: {e}")
            failures.append(name)
            records[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "sec": round(time.perf_counter() - t0, 2),
                "err": f"{type(e).__name__}: {e}"[:300],
            }
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name}: no_oracle rows={len(ray_df)} ({time.perf_counter()-t0:.1f}s)")
            records[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "ray_rows": len(ray_df), "oracle_rows": None,
                "sec": round(time.perf_counter() - t0, 2), "err": None,
                "no_oracle": True,
            }
            continue
        try:
            ora_df = con.sql(sql).df()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {type(e).__name__}: {e}")
            failures.append(name)
            records[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "ray_rows": len(ray_df),
                "sec": round(time.perf_counter() - t0, 2),
                "err": f"oracle {type(e).__name__}: {e}"[:300],
            }
            continue
        r = compare(name, ray_df, ora_df)
        status = "OK" if all(r.values()) else f"FAIL {r}"
        dt = time.perf_counter() - t0
        print(f"{name}: {status} rows={len(ray_df)}/{len(ora_df)} ({dt:.1f}s)")
        if not all(r.values()):
            failures.append(name)
        records[name] = {
            **r, "ray_rows": len(ray_df), "oracle_rows": len(ora_df),
            "sec": round(dt, 2), "err": None,
        }

    print(f"\n{len(names)-len(failures)}/{len(names)} green; failures: {failures}")
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump({"sf_dir": sf_dir, "results": records}, f, indent=1)
        print(f"wrote {json_out}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
