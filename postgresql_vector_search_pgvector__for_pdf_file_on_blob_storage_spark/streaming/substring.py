"""Incremental (streaming) substring-level dedup — the ngram_dup_stats
question asked at ingest time (SURVEY.md §2B B18 x B13 composition): *as
each new document arrives, how much of it is made of word n-gram windows
already seen in accepted documents?*

Third member of the incremental-dedup family (MinHash bands: neardup.py;
semantic vectors: semdedup.py), sharing their store discipline
(streaming/stores.py: read-probe existence, epoch-keyed idempotent
writes, layout/epoch guards):

- A **gram store** (parquet, partitioned by ``bucket`` = gk mod 64)
  holds one row per distinct accepted 64-bit gram hash — 8 bytes of
  payload per corpus-wide distinct gram, never text.  Registration
  anti-joins against the store so it stays distinct under append.
- Per micro-batch: shingle the new docs once (the batch operator's
  native sliding-window expressions), mark each distinct (doc, gram) as
  duplicated if the gram occurs in >= 2 docs OF THIS BATCH or exists in
  the store (a left-semi bucket-pruned join), and emit per-doc stats
  ``(doc_id, n_windows, n_grams, n_dup_grams, dup_gram_ppm)`` with the
  batch operator's exact column contract.
- A SINGLE batch over a whole corpus is therefore equivalent to the
  batch operator ``dedup.ngram_dup_stats(min_docs=2)`` — pinned by test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as X
from ..operators.dedup import word_shingles
from ..utils import spread
from .stores import prepare_store, read_store

__all__ = ["detect_and_register", "substring_stream"]

N_BUCKETS = 64


def detect_and_register(
    batch: DataFrame,
    gram_dir: str,
    stats_dir: str,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    epoch_id: int | None = None,
) -> None:
    """Process one (micro-)batch of documents: append per-doc duplicated-
    window stats to ``stats_dir``, then register the batch's novel gram
    hashes.  Epoch semantics and call styles mirror the sibling modules
    (``epoch_id`` -> idempotent overwrite; direct calls append)."""
    spark = batch.sparkSession
    base = (
        spread(batch)
        .select(
            F.col(id_col).cast("long").alias("id"),
            word_shingles(text_col, n).alias("grams"),
            F.greatest(
                F.size(X.word_tokens(text_col)) - F.lit(n - 1), F.lit(0)
            )
            .cast("long")
            .alias("n_windows"),
        )
        .localCheckpoint(eager=True)
    )
    g = (
        base.select("id", F.explode("grams").alias("__g"))
        .select("id", F.xxhash64("__g").alias("gk"))
        .withColumn("bucket", F.pmod(F.col("gk"), F.lit(N_BUCKETS)))
        .localCheckpoint(eager=True)
    )
    # duplicated within this batch (g is distinct per doc -> count = df)
    batch_dup = (
        g.groupBy("gk")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= 2)
        .select("gk")
    )
    store = prepare_store(
        read_store(spark, gram_dir), epoch_id, "substring gram store"
    )
    if store is not None:
        # Bucket-pruned store probe: only the buckets present in this
        # batch are read (bucket list is <= N_BUCKETS literals).
        buckets = [
            r["bucket"] for r in g.select("bucket").distinct().collect()
        ]
        store = store.filter(F.col("bucket").isin(buckets))
        dup_keys = batch_dup.unionByName(
            store.select("gk")
        ).distinct()
    else:
        dup_keys = batch_dup
    per_doc = (
        g.join(dup_keys, "gk", "left_semi")
        .groupBy("id")
        .agg(F.count("*").alias("n_dup_grams"))
    )
    stats = (
        base.select(
            "id", "n_windows", F.size("grams").cast("long").alias("n_grams")
        )
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_windows",
            "n_grams",
            F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias(
                "n_dup_grams"
            ),
        )
        .withColumn(
            "dup_gram_ppm",
            F.when(
                F.col("n_grams") > 0,
                F.expr(
                    "(n_dup_grams * CAST(1000000 AS BIGINT)) div n_grams"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )
    # Register only NOVEL grams (anti-join) so the store stays distinct
    # under append — one row per corpus-wide distinct gram forever.
    novel = g.select("gk", "bucket").distinct()
    if store is not None:
        novel = novel.join(store.select("gk"), "gk", "left_anti")
    if epoch_id is None:
        stats.write.mode("append").parquet(stats_dir)
        novel.write.partitionBy("bucket").mode("append").parquet(gram_dir)
    else:
        e = int(epoch_id)
        stats.write.mode("overwrite").parquet(f"{stats_dir}/epoch={e}")
        novel.write.partitionBy("bucket").mode("overwrite").parquet(
            f"{gram_dir}/epoch={e}"
        )


def substring_stream(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    gram_dir: str,
    stats_dir: str,
    checkpoint: str,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming wrapper: parquet-directory source -> per-micro-batch
    :func:`detect_and_register` with epoch-keyed idempotent writes;
    AvailableNow trigger, same contract as the sibling streams."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        detect_and_register(
            batch_df,
            gram_dir,
            stats_dir,
            n=n,
            text_col=text_col,
            id_col=id_col,
            epoch_id=epoch_id,
        )

    return (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
