"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

SPREAD_CONF = "spark.graft.spread.enabled"


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Ensure at least ``defaultParallelism * min_factor`` partitions.

    Fixture tables are single parquet files -> one input partition, which
    serializes every expensive per-row stage (shingling, UDFs) onto one
    core.  On a real many-file dataset this is unnecessary — and the
    partition-count probe itself (``df.rdd.getNumPartitions()``) is an
    eager planner round-trip that a library primitive should not pay per
    query (VERDICT r01) — so cluster deployments set
    ``spark.graft.spread.enabled=false`` to make this a zero-cost no-op.
    When enabled (the default, right for local/fixture runs) the probe
    keeps the guarantee that partitioning is never *reduced*.
    """
    sess = df.sparkSession
    if sess.conf.get(SPREAD_CONF, "true") != "true":
        return df
    target = sess.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
