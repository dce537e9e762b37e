"""Typed table DDL — the engine's analog of the reference's vector-table
creation (SURVEY.md §2A row 31):

    CREATE TABLE DOCUMENT_SEARCH_VECTOR (id uuid, embedding VECTOR(1536),
      origntext varchar(8192), fileName varchar(2048), pageNumber integer,
      PRIMARY KEY (id))                       -- README.md:150-158

Spark has no uuid/VECTOR(n)/PK; the typed schema plus engine-level invariant
checks reproduce the observable guarantees (SURVEY.md §7.4 items 3/5):
- embedding dimension fixed (pgvector rejects wrong dims at insert),
- id uniqueness (PK) checked at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vector as V

CHUNKS_TABLE_DDL = """
CREATE TABLE IF NOT EXISTS {name} (
  id STRING NOT NULL,
  embedding ARRAY<FLOAT>,
  origntext STRING,
  fileName STRING,
  pageNumber INT
) USING parquet
{location}
"""


def create_chunks_table(
    spark: SparkSession, name: str = "chunks", location: str | None = None
) -> None:
    loc = f"LOCATION '{location}'" if location else ""
    spark.sql(CHUNKS_TABLE_DDL.format(name=name, location=loc))


def validate_chunks(df: DataFrame, dim: int) -> DataFrame:
    """Raise on constraint violations, else return ``df`` unchanged.

    Executes one cheap aggregate: dim violations (VECTOR(n) semantics) and
    duplicate ids (PRIMARY KEY semantics).  Call before appending to the
    vector table; at scale this is a single pass piggybacked on the write.
    """
    stats = df.agg(
        F.sum(F.when(~V.dim_check("embedding", dim), 1).otherwise(0)).alias(
            "bad_dim"
        ),
        (F.count("*") - F.countDistinct("id")).alias("dup_ids"),
    ).first()
    if stats["bad_dim"]:
        raise ValueError(
            f"{stats['bad_dim']} rows violate VECTOR({dim}) dimension check"
        )
    if stats["dup_ids"]:
        raise ValueError(f"{stats['dup_ids']} duplicate primary-key ids")
    return df


def append_chunks(
    df: DataFrame, table: str, dim: int, validate: bool = True
) -> None:
    """The reference's INSERT path (Function.java:151-165) as a validated
    bulk append — no per-row connections, one job."""
    out = validate_chunks(df, dim) if validate else df
    out.write.mode("append").insertInto(table)
