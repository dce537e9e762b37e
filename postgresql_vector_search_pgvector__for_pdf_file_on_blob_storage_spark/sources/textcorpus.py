"""Text-corpus source/sink: JSONL ingestion and size-bounded parquet output.

The reference ingests blobs pushed one at a time (Function.java:71-79); a
training-data pipeline's front door is bulk line-delimited JSON (web dumps,
crawl shards).  This module pins the two halves of that exchange:

- ``read_jsonl_corpus``: schema-EXPLICIT JSONL scan.  At 100 TB schema
  inference is a second full pass over the data, so the schema is a
  required argument, never inferred.  ``multiLine`` stays False — line-
  delimited JSON splits on newlines, so one 1 TB shard still fans out
  across tasks; a multiline JSON file is one task.  Malformed lines are
  data, not exceptions: PERMISSIVE mode lands them in a corrupt-record
  column for quarantine accounting (the same drop-nothing-silently rule as
  dedup's ``max_df`` observe metrics).

- ``write_sharded_parquet``: parquet output with bounded file sizes via
  ``maxRecordsPerFile`` (records, not bytes — the planner-cheap knob that
  needs no pre-pass sizing scan) plus optional within-partition ordering
  so downstream scans get row-group locality on the sort key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: str,
    mode: str = "PERMISSIVE",
    compression: str | None = None,
) -> DataFrame:
    """Read line-delimited JSON with an explicit schema.

    ``mode``: PERMISSIVE (default — malformed lines produce a row with all
    schema fields NULL and the raw line in ``_corrupt_record``),
    DROPMALFORMED (drop such lines), or FAILFAST (raise).  The corrupt
    column is appended automatically in PERMISSIVE mode so callers never
    lose lines silently.
    """
    full_schema = schema
    if mode.upper() == "PERMISSIVE" and CORRUPT_COL not in schema:
        full_schema = f"{schema}, {CORRUPT_COL} string"
    reader = (
        spark.read.format("json")
        .schema(full_schema)
        .option("mode", mode)
        .option("multiLine", "false")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if compression:
        reader = reader.option("compression", compression)
    return reader.load(path)


def quarantine_corrupt(
    df: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (clean, quarantined, cached).

    Clean rows drop the corrupt column; quarantined rows keep only the raw
    line, ready for a repair pass or an audit sink.

    CACHING CONTRACT: the parsed frame is cached and RETURNED as the third
    element — the caller owns its lifetime and must call
    ``cached.unpersist()`` once both halves are materialized (a long-lived
    session running repeated quarantine passes otherwise accumulates cached
    partitions).  Caching is not optional here: Spark refuses plans whose
    only referenced column from a raw JSON scan is the corrupt-record
    column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and both
    halves of the split re-scan the same input anyway — one cached parse
    feeding both sides is also the cheaper shape.
    """
    if CORRUPT_COL not in df.columns:
        empty = df.sparkSession.createDataFrame([], f"{CORRUPT_COL} string")
        return df, empty, df
    df = df.cache()
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return clean, corrupt, df


def write_sharded_parquet(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 1_000_000,
    partition_by: list[str] | None = None,
    sort_within: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet with bounded output files.

    ``maxRecordsPerFile`` caps each task's output file size without a
    byte-counting pre-pass; combined with AQE's coalescing it yields files
    near the target instead of one-file-per-shuffle-partition extremes
    (thousands of tiny files kill the next job's scan planning at 100 TB
    as surely as one giant file kills its parallelism).  ``sort_within``
    orders rows inside each task (no global shuffle) so parquet row-group
    min/max stats on the sort key actually prune.
    """
    out = df
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    writer = (
        out.write.mode(mode)
        .option("maxRecordsPerFile", str(int(max_records_per_file)))
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
