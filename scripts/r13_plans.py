"""Capture `.explain("formatted")` snapshots for round-13 optimization.

Usage: python scripts/r13_plans.py <before|after> [name ...]

Writes plans/r13/<name>_<suffix>.txt for each requested query name.
Names resolve against queries.QUERIES first (the individual operator
registry the bench times), then the driver registry (suite entries).
Default list = every bench headline + pipeline-suite member (the timed
surfaces this round optimizes).  Construction-time side effects (tercile
folds, k-means fits, stream drains) run as part of building the
DataFrame — the snapshot is of the FINAL returned plan, the same object
the bench's noop sink executes.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (  # noqa: E402
    get_spark,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (  # noqa: E402
    queries as Q,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.plans import (  # noqa: E402
    explain as E,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, "plans", "r13")


def default_names() -> list[str]:
    return list(bench.HEADLINE) + list(bench._pipeline_queries().keys())


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or default_names()
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name=f"r13-plans-{suffix}")
    pipeline = bench._pipeline_queries()
    for name in names:
        fn = Q.QUERIES.get(name) or pipeline.get(name)
        if fn is None:
            import __spark_entry__ as entrymod

            fn = entrymod.queries().get(name)
        if fn is None:
            print(f"SKIP {name}: not found", file=sys.stderr)
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = E.plan_string(df, "formatted")
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building plan: {exc}"
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        Q.clear_ingest_cache()


if __name__ == "__main__":
    main()
