"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf and compares against
``oracle_sql()`` via DuckDB: row count, column names, and an
order-insensitive value hash (values rounded/stringified the same way on
both sides).

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import numpy as np
import pandas as pd


def canonical_hash(df: pd.DataFrame) -> str:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            df[c] = col.round(6).map(
                lambda v: "null" if pd.isna(v) else f"{v:.6f}"
            )
        elif str(col.dtype).startswith("datetime"):
            df[c] = col.astype("datetime64[us]").astype(str)
        else:
            df[c] = col.map(lambda v: "null" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    rows = sorted("|".join(r) for r in df.astype(str).itertuples(index=False))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, ".")
    import __spark_entry__ as E
    from netascore_spark.session import build_session

    spark = build_session(app_name="oracle-check", master="local[8]",
                          shuffle_partitions=8)

    con = duckdb.connect()
    for t in E.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oq = E.queries(), E.oracle_sql()
    # entries past the driver's 50-row report cap (see extra_queries()
    # docstring): included here so the full surface is checked locally.
    # --extra restricts the run to just those.
    if "--extra" in only:
        only.discard("--extra")
        qs, oq = E.extra_queries(), E.extra_oracle_sql()
    else:
        qs = {**qs, **E.extra_queries()}
        oq = {**oq, **E.extra_oracle_sql()}
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            continue
        if name not in oq:
            print(f"rows  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s, rows-only)")
            continue
        try:
            ddf = con.execute(oq[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        ok_rows = len(sdf) == len(ddf)
        ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
        ok_hash = ok_rows and ok_cols and canonical_hash(sdf) == canonical_hash(ddf)
        status = "OK   " if (ok_rows and ok_cols and ok_hash) else "FAIL "
        print(
            f"{status} {name}: spark={len(sdf)} duck={len(ddf)} cols={'ok' if ok_cols else sorted(sdf.columns)+sorted(ddf.columns)} "
            f"hash={'ok' if ok_hash else 'MISMATCH'} ({time.time()-t0:.1f}s)"
        )
        if not (ok_rows and ok_cols and ok_hash):
            failures.append(name)
            if ok_cols and ok_rows:
                # show a sample diff
                key = sorted(sdf.columns)
                a = sdf[key].copy()
                b = ddf[key].copy()
                for c in key:
                    if a[c].dtype.kind == "f":
                        a[c] = a[c].round(6)
                    if b[c].dtype.kind == "f":
                        b[c] = b[c].round(6)
                a["__src"] = "spark"
                b["__src"] = "duck"
                merged = pd.concat([a, b]).drop_duplicates(subset=key, keep=False)
                print(merged.sort_values(key).head(8).to_string())

    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
