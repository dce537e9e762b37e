"""Local emulation of the driver's correctness gate.

Runs every ``queries()[name]`` on Spark and, where an ``oracle_sql()`` twin
exists, the same query on DuckDB over the same parquet — then compares
row count, schema (column names), and an order-insensitive canonical value
set.  Stricter than needed is fine: if this passes, the driver's hash
compare passes.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (  # noqa: E402
    TABLES,
    get_spark,
)


def canon(v):
    """Canonical string for a cell value (exact — no tolerance)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def frame_to_canonical(df) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = sorted(
        tuple(canon(row[c]) for c in cols) for _, row in df[cols].iterrows()
    )
    return cols, rows


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if vanilla:
        # Driver-faithful session: no engine tuning (no forced UTC, default
        # shuffle partitions) — queries must not depend on get_spark().
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        # Driver fixtures are single files; Spark-written scaled fixtures
        # (scripts/make_scaled_fixture.py) are directories of part files.
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        # Allow pinpointing suite MEMBERS by their full-registry name (the
        # driver contract groups them — see driver_registry.SUITES).
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (
            queries as Q,
        )

        for name in only - set(qs):
            if name in Q.QUERIES:
                qs[name] = Q.QUERIES[name]
                if name in Q.ORACLES:
                    oracles[name] = Q.ORACLES[name]
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows ({dt:.1f}s) [no oracle]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        scols, srows = frame_to_canonical(sdf)
        ocols, orows = frame_to_canonical(odf)
        if scols != ocols:
            print(f"FAIL  {name}: columns {scols} != {ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
            n_fail += 1
            continue
        bad = [
            (a, b) for a, b in zip(srows, orows) if a != b
        ]
        if bad:
            print(f"FAIL  {name}: {len(bad)} mismatched rows; first: ")
            print(f"      spark {bad[0][0]}")
            print(f"      duck  {bad[0][1]}")
            n_fail += 1
            continue
        # dtype check (advisory): compare pandas dtypes
        dt_s = {c: str(sdf[c].dtype) for c in sdf.columns}
        dt_o = {c: str(odf[c].dtype) for c in odf.columns}
        note = "" if dt_s == dt_o else f"  [dtypes spark={dt_s} duck={dt_o}]"
        print(f"PASS  {name}: {len(srows)} rows ({dt:.1f}s){note}")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
