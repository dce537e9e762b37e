"""JDBC parity path (sources/jdbc.py) against embedded Derby — the only
JDBC-capable store in the sandbox.  The reference reads its vector table
over JDBC (SSEOpenAIController.java:315-320); these tests pin that the
engine's JDBC surface round-trips, pushes filters/projections into the
remote query, and parallelizes via partitioned range reads.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.sources import (
    jdbc as J,
)


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "chunksdb"
    url = f"jdbc:derby:{db};create=true"
    chunks = spark.range(200).select(
        F.col("id").alias("chunk_id"),
        (F.col("id") % 7).alias("page"),
        F.concat(F.lit("chunk text "), F.col("id")).alias("body"),
    )
    J.write_jdbc_table(chunks, url, "chunks", driver=J.DERBY_EMBEDDED_DRIVER)
    return url


def test_jdbc_roundtrip(spark, derby_url):
    back = J.read_jdbc_table(
        spark, derby_url, "chunks", driver=J.DERBY_EMBEDDED_DRIVER
    )
    assert back.count() == 200
    assert set(back.columns) == {"chunk_id", "page", "body"}
    assert back.agg(F.sum("chunk_id")).collect()[0][0] == sum(range(200))


def test_jdbc_filter_and_projection_pushdown(spark, derby_url):
    """Predicates reach the remote WHERE clause and the SELECT list is
    pruned — the scan must not fetch all columns/rows to filter locally."""
    back = J.read_jdbc_table(
        spark, derby_url, "chunks", driver=J.DERBY_EMBEDDED_DRIVER
    )
    q = back.filter(F.col("page") == 3).select("chunk_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "EqualTo(page,3)" in plan.replace('"', "")
    assert "ReadSchema: struct<chunk_id:bigint>" in plan
    assert q.count() == 29  # ids ≡ 3 (mod 7) in [0, 200)


def test_jdbc_partitioned_read_parallelizes(spark, derby_url):
    back = J.read_jdbc_table(
        spark,
        derby_url,
        "chunks",
        driver=J.DERBY_EMBEDDED_DRIVER,
        partition_column="chunk_id",
        lower_bound=0,
        upper_bound=200,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    # no row lost or duplicated at the range boundaries
    assert back.select("chunk_id").distinct().count() == 200


def test_jdbc_partition_options_validated(spark, derby_url):
    with pytest.raises(ValueError, match="partition_column requires"):
        J.read_jdbc_table(
            spark, derby_url, "chunks", partition_column="chunk_id"
        )
