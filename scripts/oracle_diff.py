"""Direct oracle-diff harness: compare one named query vs its DuckDB oracle directly
(pre-suite), at a given sf_dir.  Usage: python scripts/oracle_diff.py
[sf_dir] name..."""
from __future__ import annotations

import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (  # noqa: E402
    TABLES,
    get_spark,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (  # noqa: E402
    queries as Q,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or ["curation_v3_pipeline"]
    spark = get_spark(app_name="scratch")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    for name in names:
        t0 = time.time()
        sdf = Q.QUERIES[name](spark, sf_dir).toPandas()
        t1 = time.time()
        odf = con.execute(Q.ORACLES[name]).fetchdf()
        t2 = time.time()
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        print(f"{name}: spark {len(sdf)} rows {t1-t0:.1f}s, "
              f"oracle {len(odf)} rows {t2-t1:.1f}s")
        if scols != ocols:
            print(f"  SCHEMA MISMATCH: {scols} vs {ocols}")
            continue
        a = sorted(tuple(str(v) for v in r) for r in sdf[scols].itertuples(index=False))
        b = sorted(tuple(str(v) for v in r) for r in odf[ocols].itertuples(index=False))
        if a == b:
            print("  VALUES MATCH")
            if "stripped_tokens" in sdf.columns:
                ns = int((sdf["stripped_tokens"] > 0).sum())
                print(f"  docs with stripped_tokens>0: {ns}; "
                      f"total stripped: {int(sdf['stripped_tokens'].sum())}")
        else:
            diff_a = [r for r in a if r not in set(b)][:5]
            diff_b = [r for r in b if r not in set(a)][:5]
            print(f"  VALUE MISMATCH; spark-only {diff_a}")
            print(f"  oracle-only {diff_b}")


if __name__ == "__main__":
    main()
