"""Shared helpers for the streaming state-table ("store") pattern used by
the incremental dedup modules (neardup.py, semdedup.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def read_store(spark: SparkSession, path: str) -> DataFrame | None:
    """Open a parquet store, or None if it does not exist yet.  A read
    attempt rather than ``os.path.exists`` so s3://, hdfs://, abfss://
    and local paths all behave identically.

    Only a MISSING path maps to None — any other analysis failure
    (corrupt metadata, conflicting partition layouts, schema drift,
    access errors surfaced as AnalysisException) re-raises: an
    existing-but-unreadable store must be a loud failure, never a silent
    "no history, register everything as fresh" miss."""
    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        marker = getattr(e, "errorClass", None) or ""
        if "PATH_NOT_FOUND" in (marker or "") or "PATH_NOT_FOUND" in str(e):
            return None
        raise


def prepare_store(
    store: DataFrame | None, epoch_id: int | None, what: str
) -> DataFrame | None:
    """Validate and prepare an opened store for one batch.

    - **Layout consistency**: the epoch-keyed (streaming) and flat
      (direct batch-twin) call styles produce incompatible directory
      layouts; mixing them against one store corrupts partition
      discovery — refuse loudly instead.
    - **Epoch monotonicity**: Structured Streaming replays at most the
      LAST uncommitted batch, so a valid ``epoch_id`` is >= every epoch
      already in the store.  A smaller one means the batch counter was
      reset (fresh/deleted checkpoint pointed at an existing store, or
      two streams sharing directories) — overwriting old epochs would
      silently destroy accepted state, so refuse.
    - **Replay hygiene**: a replayed epoch's own earlier registration is
      this very batch; drop it from the candidate side (the
      within-batch join covers those pairs exactly once).
    """
    if store is None:
        return None
    has_epoch = "epoch" in store.columns
    if epoch_id is None:
        if has_epoch:
            raise ValueError(
                f"{what}: store was written epoch-keyed (streaming mode)"
                " but this call has no epoch_id; mixing the flat and"
                " epoch layouts corrupts partition discovery.  Use the"
                " streaming wrapper, or a fresh store for direct calls."
            )
        return store
    if not has_epoch:
        raise ValueError(
            f"{what}: store was written flat (direct batch-twin mode)"
            " but this call is epoch-keyed; mixing the layouts corrupts"
            " partition discovery.  Use a fresh store for the stream."
        )
    max_epoch = store.agg(F.max("epoch")).collect()[0][0]
    if max_epoch is not None and int(epoch_id) < int(max_epoch):
        raise ValueError(
            f"{what}: batch epoch {int(epoch_id)} is behind the store's"
            f" newest epoch {int(max_epoch)} — the stream's batch counter"
            " went backwards (fresh/deleted checkpoint pointed at an"
            " existing store, or two streams share these directories)."
            " Overwriting would silently destroy accepted state; use a"
            " fresh store or restore the matching checkpoint."
        )
    return store.filter(F.col("epoch") != int(epoch_id))


def write_store_partitioned(
    df: DataFrame, path: str, partition_col: str, epoch_id: int | None
) -> None:
    """Store-registration write shared by the streaming dedup modules.

    Skips the write entirely when the frame is EMPTY: a partitioned write
    of zero rows produces a directory with no parquet files (only
    _SUCCESS — Spark's empty-schema marker file applies to
    non-partitioned writes), and every later ``read_store`` would then
    die with UNABLE_TO_INFER_SCHEMA even though no state is corrupt.
    Skipping keeps the store genuinely absent until something registers.
    """
    if df.limit(1).count() == 0:
        return
    target = path if epoch_id is None else f"{path}/epoch={int(epoch_id)}"
    mode = "append" if epoch_id is None else "overwrite"
    df.write.partitionBy(partition_col).mode(mode).parquet(target)
