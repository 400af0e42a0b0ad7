"""Local stand-in for the driver's correctness gate: run every REGISTRY
query in Spark AND its DuckDB oracle on the same sf dir, compare row
count, column set, and order-insensitive values.

Usage: python scripts/check_oracles.py [--json] [sf_dir] [query ...]

With --json, a machine-readable per-query record list (same shape as
the driver's CORRECTNESS artifact: name, rows, values, err) is printed
as ONE JSON object on stdout and the human log goes to stderr — the
per-round ORACLES_rNN.json artifact covering ALL registry entries, not
just the driver's 50-slot window.
"""

from __future__ import annotations

import json
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # decode any decimal/bytes-likes to canonical types
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            if getattr(df[c].dt, "tz", None):
                df[c] = df[c].dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[ns]")
        if pd.api.types.is_bool_dtype(df[c]) or str(df[c].dtype) == "boolean":
            df[c] = df[c].astype("boolean")
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        na_position="last")
    return df


def main() -> int:
    argv = list(sys.argv[1:])
    as_json = "--json" in argv
    if as_json:
        argv.remove("--json")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    log = sys.stderr if as_json else sys.stdout

    from skyline_spark.queries import REGISTRY
    from skyline_spark.session import get_spark
    spark = get_spark(master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    records: list[dict] = []

    def record(name: str, status: str, rows, err: str | None = None,
               oracle: bool = True) -> None:
        records.append({"query": name, "status": status,
                        "rows": rows, "oracle": oracle, "err": err})

    failures = 0
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}",
                  file=log)
            record(name, "spark_error", None, f"{type(e).__name__}: {e}")
            failures += 1
            continue
        if sql is None:
            print(f"ok    {name}: rows-only ({len(sdf)} rows)", file=log)
            record(name, "rows_only", len(sdf), oracle=False)
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}",
                  file=log)
            record(name, "duckdb_error", len(sdf),
                   f"{type(e).__name__}: {e}")
            failures += 1
            continue
        a, b = normalize(sdf), normalize(odf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} "
                  f"vs {list(b.columns)}", file=log)
            record(name, "schema_mismatch", len(a),
                   f"{list(a.columns)} vs {list(b.columns)}")
            failures += 1
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}", file=log)
            record(name, "rows_mismatch", len(a),
                   f"spark {len(a)} vs oracle {len(b)}")
            failures += 1
            continue
        try:
            # EVERY column byte-exact — the driver hashes exact value
            # reprs, so a float tolerance here can pass a value the
            # driver's hash rejects (r04's feature_profiles red row was
            # exactly that: a 5e-7 rounding-boundary straddle under the
            # old rtol=1e-6). Every registered query already rounds its
            # float outputs boundary-safely, so exact comparison is the
            # honest local twin of the driver gate.
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=True)
        except AssertionError as e:
            print(f"FAIL  {name}: value mismatch\n{str(e)[:600]}", file=log)
            record(name, "value_mismatch", len(a), str(e)[:300])
            failures += 1
            continue
        # the driver hashes byte-exact value reprs, so -0.0 vs 0.0 (equal
        # under ==, hidden by round()) is a real hash mismatch — check the
        # sign bit of every zero explicitly
        szero = [
            c for c in a.columns
            if pd.api.types.is_float_dtype(a[c])
            and bool(np.any((a[c].to_numpy() == 0) & (b[c].to_numpy() == 0)
                            & (np.signbit(a[c].to_numpy())
                               != np.signbit(b[c].to_numpy()))))
        ]
        if szero:
            print(f"FAIL  {name}: signed-zero mismatch in {szero}", file=log)
            record(name, "signed_zero_mismatch", len(a), str(szero))
            failures += 1
        else:
            print(f"OK    {name}: {len(a)} rows match", file=log)
            record(name, "ok", len(a))
    print(f"\n{failures} failures", file=log)
    if as_json:
        counts = {}
        for r in records:
            counts[r["status"]] = counts.get(r["status"], 0) + 1
        print(json.dumps({"sf_dir": sf_dir, "total": len(records),
                          "failures": failures, "by_status": counts,
                          "queries": records}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
