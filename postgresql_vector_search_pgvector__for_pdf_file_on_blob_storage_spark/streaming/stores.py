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
) -> bool:
    """Store-registration write shared by the streaming dedup modules.
    Returns True iff rows were written.

    Skips the write entirely when the frame is EMPTY: a partitioned write
    of zero rows produces a directory with no parquet files (only
    _SUCCESS — Spark's empty-schema marker file applies to
    non-partitioned writes), and every later ``read_store`` would then
    die with UNABLE_TO_INFER_SCHEMA even though no state is corrupt.
    Skipping keeps the store genuinely absent until something registers.
    """
    if df.limit(1).count() == 0:
        return False
    target = path if epoch_id is None else f"{path}/epoch={int(epoch_id)}"
    mode = "append" if epoch_id is None else "overwrite"
    df.write.partitionBy(partition_col).mode(mode).parquet(target)
    return True


def compact_store(
    spark: SparkSession,
    path: str,
    partition_col: str,
    sort_cols: list[str] | None = None,
) -> dict:
    """Maintenance compaction for an epoch-keyed streaming store.

    Every micro-batch appends an ``epoch=K`` directory with one file per
    touched ``partition_col`` value, so a long-running stream accumulates
    thousands of small files and the per-batch full-store probe
    (the dominant per-batch I/O — streaming/substring.py's design note)
    pays ever-growing file-open overhead.  This rewrites all FULLY
    COMMITTED history — every epoch strictly below the newest — into one
    consolidated ``epoch = max-1`` directory, one file per partition,
    sorted by ``sort_cols`` (row-group min/max stats + better
    encoding), leaving the NEWEST epoch untouched.

    Why ``max-1`` and not ``max``: Structured Streaming may replay the
    newest epoch after a crash, and ``prepare_store`` drops the replayed
    epoch's own rows from the candidate store — if compaction folded all
    history into ``epoch=max``, that replay would silently drop the
    whole corpus history.  Folding into ``max-1`` keeps replay semantics
    and the epoch-monotonicity guard intact (max epoch unchanged).

    MUST run under single-writer discipline: either while the stream is
    stopped (manual maintenance window) or from INSIDE the stream's own
    ``foreachBatch`` callback (``substring_stream(compact_every=K)`` —
    the stream is the single writer while the callback runs).  The swap
    — write sibling temp dir, delete old epoch dirs, rename temp in —
    is not atomic on object stores, so a second concurrent writer could
    observe a partial store.  Returns a summary dict.
    """
    from pyspark.sql import functions as F  # local alias, matches module

    store = read_store(spark, path)
    if store is None:
        return {"compacted": False, "reason": "store missing"}
    if "epoch" not in store.columns:
        raise ValueError(
            "compact_store: flat (non-epoch) stores are single-writer"
            " appends with no epoch dirs to fold — nothing to compact"
        )
    epochs = sorted(
        r[0] for r in store.select("epoch").distinct().collect()
    )
    if len(epochs) < 2:
        return {"compacted": False, "reason": "single epoch"}
    max_epoch = epochs[-1]
    target_epoch = max_epoch - 1
    hist = store.filter(F.col("epoch") < max_epoch).drop("epoch")
    tmp = path.rstrip("/") + ".compact_tmp"
    writer = hist.repartition(F.col(partition_col))
    if sort_cols:
        writer = writer.sortWithinPartitions(partition_col, *sort_cols)
    writer.write.partitionBy(partition_col).mode("overwrite").parquet(tmp)

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path
    fs = jpath(path).getFileSystem(hconf)
    # Swap ordering minimizes the unreadable window: delete ONLY the
    # target epoch dir, rename tmp (which holds the full folded history)
    # into its place, then delete the remaining old epoch dirs.  A crash
    # before the rename loses only epoch=target from the live tree (full
    # history still in .compact_tmp); a crash after the rename leaves
    # folded history PLUS stale old epochs — harmless duplicates for a
    # membership store, cleaned up by re-running compaction.
    fs.delete(jpath(f"{path}/epoch={int(target_epoch)}"), True)
    ok = fs.rename(jpath(tmp), jpath(f"{path}/epoch={int(target_epoch)}"))
    if not ok:
        raise IOError(
            f"compact_store: rename of {tmp} into the store failed —"
            " history is preserved in the temp dir; restore manually"
        )
    # Delete every folded epoch EXCEPT the target.  Epochs need not be
    # contiguous (write_store_partitioned skips empty frames), so the
    # target dir is not necessarily epochs[-2] — a positional slice here
    # would leave a stale epoch dir whose duplicate rows a re-run of
    # compaction folds permanently into the consolidated file.
    for e in epochs[:-1]:
        if int(e) != int(target_epoch):
            fs.delete(jpath(f"{path}/epoch={int(e)}"), True)
    return {
        "compacted": True,
        "epochs_folded": len(epochs) - 1,
        "target_epoch": int(target_epoch),
    }
