"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Ensure at least ``defaultParallelism * min_factor`` partitions.

    Fixture tables are single parquet files -> one input partition, which
    serializes every expensive per-row stage (shingling, UDFs) onto one
    core.  On a real many-file dataset this is a no-op; locally it costs a
    tiny round-robin shuffle and buys full parallelism.  Never *reduces*
    partitioning.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
