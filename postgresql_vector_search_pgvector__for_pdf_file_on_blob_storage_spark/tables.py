"""Parquet table loading & view registration for the driver's fixtures.

The driver materializes TPC-H-ish tables plus ``documents`` (proxy for
extracted PDF pages — reference ``PageInfo``, BlobUploadDetector/src/main/
java/com/yoshio3/PageInfo.java:3) and ``embeddings`` (proxy for the pgvector
table ``DOCUMENT_SEARCH_VECTOR``, README.md:155-158) at
``/root/testdata/sf*/``.  Scans are plain ``spark.read.parquet`` so Catalyst
gets predicate pushdown + column pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Columnar scan; filters/projections push down.

    ``events.ts`` has shipped in two parquet encodings across driver data
    generations: INT64 TIMESTAMP(NANOS) (rejected by Spark's vectorized
    reader — read as long via ``spark.sql.legacy.parquet.nanosAsLong`` and
    truncated to micros, same as DuckDB) and TIMESTAMP(MICROS) with
    ``isAdjustedToUTC=false`` (inferred as TIMESTAMP_NTZ by Spark 4).  We
    normalize both to a session-zone TIMESTAMP so epoch extraction
    (``unix_micros``), windows, and watermarks type-check; with the engine's
    UTC session timezone the wall-clock values match DuckDB's naive reading.
    Disabling NTZ inference at the reader (not a post-scan cast) keeps
    filter pushdown on ``ts`` intact.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view so operators can be written in SQL."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
