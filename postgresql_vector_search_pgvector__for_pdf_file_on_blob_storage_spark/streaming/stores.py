"""Shared helpers for the streaming state-table ("store") pattern used by
the incremental dedup modules (neardup.py, semdedup.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def read_store(spark: SparkSession, path: str) -> DataFrame | None:
    """Open a parquet store, or None if it does not exist yet.  A read
    attempt rather than ``os.path.exists`` so s3://, hdfs://, abfss://
    and local paths all behave identically."""
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


def drop_own_epoch(store: DataFrame | None, epoch_id: int | None):
    """Exclude a replayed batch's own earlier registration: under
    at-least-once ``foreachBatch``, a restarted epoch finds its own rows
    in the store — those are this very batch, and the within-batch join
    already covers them."""
    if store is not None and epoch_id is not None and "epoch" in store.columns:
        return store.filter(F.col("epoch") != int(epoch_id))
    return store
