"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship RAG pipeline (documents -> normalize ->
chunk -> deterministic embeddings -> exact L2 top-5) on sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB oracles (see the engine's ``queries`` package for the
oracle-parity rules that make the value hashes match bit-for-bit).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (  # noqa: E402
    driver_registry,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (  # noqa: E402
    queries as Q,
)

# Round 1's driver sweep recorded only the first 50 registered queries, so
# the full registry (queries.QUERIES, 102 entries) is folded into <=50
# driver entries here: flagship operators stay individual; the long tail is
# grouped into suite entries that union their members' rows in a canonical
# engine-neutral string form — the oracle compare still verifies every
# member row (see driver_registry.py for the formatting rules).
_DRIVER_QUERIES, _DRIVER_ORACLES = driver_registry.build()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.QUERIES["flagship_rag_search"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (suite entries
    cover several operators each — membership in driver_registry.SUITES)."""
    return dict(_DRIVER_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (same column names &
    dtypes).  Keys absent here (chunker/embedder/LSH) are rows-only checks."""
    return dict(_DRIVER_ORACLES)
