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

    ``events.ts`` is written as parquet INT64 TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects (PARQUET_TYPE_ILLEGAL).  We read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microseconds —
    the same truncation DuckDB applies — keeping the column a proper
    timestamp for window/watermark operators.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view so operators can be written in SQL."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
