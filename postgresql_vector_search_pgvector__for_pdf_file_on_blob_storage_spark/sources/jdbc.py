"""JDBC table source — the reference's actual storage read path.

The reference reads its vector table from PostgreSQL over JDBC
(SSEOpenAIController.java:315-320: ``SELECT id, origntext, filename,
pageNumber FROM <t> ORDER BY embedding <-> ?::vector LIMIT 5`` through a
pooled JDBC connection).  The engine's primary scan is parquet
(SURVEY.md §2A row 2 — columnar beats a row-store round-trip at any
scale), but the JDBC surface itself is part of the parity contract, so it
is exposed — and exercised in tests against embedded Derby, the only
JDBC-capable store available in the sandbox (PARITY.md row for the
external-database path).

Scale notes (the parts that matter at 100 TB-adjacent sizes — a JDBC
source is never the 100 TB path itself, but the metadata/dimension-table
read it IS used for must not serialize through one connection):

- ``partition_column``/``num_partitions`` turn the read into N parallel
  range queries (``WHERE col BETWEEN ...``), one connection per task —
  without them Spark reads the whole table through ONE executor thread.
- Filter pushdown: Catalyst pushes supported predicates into the remote
  ``WHERE`` clause (visible as ``PushedFilters`` in the scan node), so
  the database prunes before bytes cross the wire.  Column pruning
  likewise becomes the remote SELECT list.
- ``fetchsize`` bounds driver-side row buffering per round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_EMBEDDED_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 1000,
) -> DataFrame:
    """Read a remote table over JDBC with optional partitioned parallelism.

    ``partition_column`` (+ bounds + ``num_partitions``) splits the scan
    into parallel range queries; omit them only for genuinely small
    tables.  Predicates and projections applied to the returned frame are
    pushed into the remote query by Catalyst (assert ``PushedFilters`` in
    the plan when it matters — tests do).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(int(fetchsize)))
    )
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and"
                " num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(int(lower_bound)))
            .option("upperBound", str(int(upper_bound)))
            .option("numPartitions", str(int(num_partitions)))
        )
    return reader.load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    driver: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a frame to a JDBC table (used to seed the parity tests; the
    production sink shape — batched inserts, one connection per task — is
    Spark's built-in JDBC writer)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        writer = writer.option("driver", driver)
    writer.mode(mode).save()
