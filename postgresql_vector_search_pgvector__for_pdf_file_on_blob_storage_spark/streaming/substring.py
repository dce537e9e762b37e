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

Store-scan cost note: for any non-tiny batch the gram hashes touch all
64 buckets, so the ``isin(buckets)`` pruning below cannot shrink the
probe and each batch pays a full distinct-gram-store scan — linear in
corpus-wide distinct grams (~22.6/doc measured, BASELINE.md).  The
maintenance lever is ``stores.compact_store`` (run between stream
sessions): folds the per-epoch small files into one sorted file per
bucket.  Measured (r06 probe, BASELINE.md): 16 seed epochs over 900k
docs leave 12,800 files; compaction folds them in 17.6 s and cuts the
next 100k arrival batch 24.0 -> 15.8 s (-34%).  The win is file-open
amortization + encoding, NOT row-group pruning — the probe key is a
uniform 64-bit hash, so every row group holds candidates for a large
batch and min/max or Bloom stats cannot prune.  For genuinely
SUB-LINEAR per-batch state movement use :func:`keyed_substring_stream`
below (r04, sharded r05 — O(batch·log corpus) probes, but per-batch
Arrow state transfer linear in corpus: 209 MB at 1M docs) or the
:func:`tiered_substring_stream` (r06 — bounded state, measured flat
44.8 MB across corpus sizes, history probed via a cached pre-shuffled
snapshot join).  For bounded MEMORY as well — history on disk, a
memory-capped Bloom screen, and row-group point lookups for the sparse
verify set — use :func:`bloom_substring_stream` (r07), the form whose
per-batch wall and executor memory do not grow with the corpus.

Choosing a form by corpus size (measured, BASELINE.md r07 crossover
probe at 2M/4.1M docs): the store-scan form is simplest and fine while
the store scan is cheap; keyed is fastest on RAW WALL through at least
4M docs on local[32] (11-17 s/arrival) but round-trips ~225 MB of Arrow
state per 1M corpus docs EVERY batch (910 MB at 4M — structurally dead
an order of magnitude later); tiered bounds state by session ingest but
caches a corpus-sized snapshot per session; bloom bounds both wall and
memory (flat 9-12 s/batch, capped bitmap) at the cost of a per-session
setup scan, and is the 100 TB shape.  Steady-state ingest (one session,
many batches) -> bloom; ad-hoc small corpora -> keyed.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as X
from ..operators.dedup import word_shingles
from ..utils import spread
from .stores import prepare_store, read_store, write_store_partitioned

__all__ = [
    "detect_and_register",
    "substring_stream",
    "keyed_substring_stream",
    "tiered_substring_stream",
    "bloom_substring_stream",
]

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
    # Gram-string discipline (same as the batch operator): the gram text
    # is never checkpointed or shuffled — the shingle expression is
    # evaluated once per slim consumer below (recompute-beats-materialize,
    # dedup.ngram_dup_stats), and only longs persist per batch.
    raw = spread(batch).select(
        F.col(id_col).cast("long").alias("id"),
        word_shingles(text_col, n).alias("grams"),
        F.greatest(
            F.size(X.word_tokens(text_col)) - F.lit(n - 1), F.lit(0)
        )
        .cast("long")
        .alias("n_windows"),
    )
    base = raw.select(
        "id", "n_windows", F.size("grams").cast("long").alias("n_grams")
    ).localCheckpoint(eager=True)
    g = (
        raw.select("id", F.explode("grams").alias("__g"))
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
    batch_gk = g.select("gk", "bucket").distinct()
    if store is not None:
        # ONE bucket-pruned store pass serves both consumers: a left join
        # marking which distinct batch grams exist in the store yields the
        # store-duplicate keys AND the novel registration set (scanning
        # the ~distinct-gram-sized store twice would double the dominant
        # per-batch I/O).
        buckets = [
            r["bucket"] for r in batch_gk.select("bucket").distinct().collect()
        ]
        hits = (
            batch_gk.join(
                store.filter(F.col("bucket").isin(buckets))
                .select("gk")
                .withColumn("__in_store", F.lit(1)),
                "gk",
                "left",
            )
            .localCheckpoint(eager=True)
        )
        dup_keys = batch_dup.unionByName(
            hits.filter(F.col("__in_store") == 1).select("gk")
        ).distinct()
        novel = hits.filter(F.col("__in_store").isNull()).select(
            "gk", "bucket"
        )
    else:
        dup_keys = batch_dup
        novel = batch_gk
    per_doc = (
        g.join(dup_keys, "gk", "left_semi")
        .groupBy("id")
        .agg(F.count("*").alias("n_dup_grams"))
    )
    stats = (
        base.join(per_doc, "id", "left")
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
    if epoch_id is None:
        stats.write.mode("append").parquet(stats_dir)
    else:
        stats.write.mode("overwrite").parquet(
            f"{stats_dir}/epoch={int(epoch_id)}"
        )
    # Register only NOVEL grams so the store stays distinct under append
    # — one row per corpus-wide distinct gram forever.  Empty-safe write
    # (an all-short-doc first batch must not poison the store dir).
    write_store_partitioned(novel, gram_dir, "bucket", epoch_id)


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
    max_files_per_trigger: int | None = None,
    on_batch=None,
    compact_every: int | None = None,
):
    """Streaming wrapper: parquet-directory source -> per-micro-batch
    :func:`detect_and_register` with epoch-keyed idempotent writes;
    AvailableNow trigger, same contract as the sibling streams.

    ``max_files_per_trigger`` bounds each micro-batch (ingest pacing at
    scale; also how the kill/resume test forces multiple batches).
    ``on_batch(epoch_id)``, if given, runs AFTER the batch's writes —
    the crash-injection seam for restart tests (a raise here simulates
    dying between the state writes and the checkpoint commit, the
    at-least-once window the epoch-keyed overwrite exists for).

    ``compact_every=K`` runs :func:`stores.compact_store` on the gram
    store inline after every K-th epoch's writes, folding committed
    epoch dirs into one sorted file per bucket — the measured 34%
    arrival-batch cut (BASELINE.md r06) without a manual maintenance
    window.  Safe inside ``foreachBatch`` because the stream IS the
    single writer while the callback runs, and compaction never touches
    the newest epoch: a crash anywhere in the
    register -> compact -> commit sequence replays the epoch through the
    same idempotent path (re-register overwrites ``epoch=e``, re-compact
    re-folds — both idempotent; prepare_store's replay guard only ever
    drops the replayed epoch's OWN rows, which compaction leaves in
    place).  A crash INSIDE compact_store's swap itself is repaired by
    its entry-time recovery (the target epoch dir is renamed aside, not
    deleted, so no state exists where the only copy of an epoch's rows
    is a dir the next run overwrites — stores.py
    ``_recover_interrupted_compaction``); the same recovery also runs at
    SESSION start below, so a restart after a mid-swap death repairs the
    store before the replayed batch's first probe reads it."""
    from .stores import recover_store

    # Unconditional: a crash inside a MANUAL maintenance-window
    # compact_store swap followed by a restart WITHOUT inline
    # compaction must still be repaired before the store is read
    # (cheap glob no-op when no swap was interrupted).
    recover_store(spark, gram_dir)

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
        if (
            compact_every is not None
            and epoch_id > 0
            and epoch_id % int(compact_every) == 0
        ):
            from .stores import compact_store

            compact_store(
                batch_df.sparkSession, gram_dir, "bucket", sort_cols=["gk"]
            )
        if on_batch is not None:
            on_batch(epoch_id)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return (
        reader.parquet(input_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Keyed-state variant: the SUB-LINEAR per-batch shape (r04, sharded r05).
#
# The parquet-store form above pays a full distinct-gram-store scan per
# batch (module docstring).  This variant keys Spark's own streaming state
# store on a SHARD of the gram-hash space — `groupBy(pmod(gk, n_shards))
# .applyInPandasWithState` — so a batch performs O(batch grams) membership
# probes against checkpointed state, and state versioning rides the
# CHECKPOINT: a replayed epoch restores the pre-batch state snapshot, so
# crash idempotence needs no epoch bookkeeping at all.  The trade: state
# lives inside the checkpoint (not a queryable parquet table), which is
# exactly the right home for a pure membership structure.
#
# Why shards, not one state key per gram (the r04 form): keying on the
# raw hash made every distinct batch gram its own pandas group — 2.3M
# single-row groups per 100k-doc batch, 87 s of pure group dispatch
# (BASELINE.md r04 probe).  Sharding the key space gives each group
# ~batch_grams/n_shards rows, so group dispatch is amortized; inside a
# group the membership set is a SORTED packed int64 array in one binary
# state column, probed with vectorized searchsorted and merged with
# union1d.  Per-batch state movement is O(corpus/n_shards × touched
# shards) bytes of Arrow-transferred int64 — for non-tiny batches every
# shard is touched, so the byte volume is linear in corpus like the
# store scan, but at ~8 bytes/gram memcpy speed instead of a
# parquet-scan + shuffle-join, and the probe CPU is O(batch·log corpus).
# Measured at the 900k/100k probe (r06, BASELINE.md): 10.3 s/batch with
# 209 MB of state crossing the Arrow boundary every batch — the linear
# byte volume is this form's scale ceiling; tiered_substring_stream
# below bounds it by session ingest instead of corpus.
# n_shards is fixed per checkpoint (guard below): changing it would
# re-route grams to shards whose state they were never written to.
# ---------------------------------------------------------------------------

_KEYED_OUT_SCHEMA = (
    "doc_id long, n_windows long, n_grams long, is_dup int"
)
_KEYED_STATE_SCHEMA = "grams binary"
# Little-endian pinned dtype for keyed-state membership bytes: a
# checkpoint written with native byte order would be silently misread
# (garbage gram hashes, missed duplicates) if resumed on a platform
# of the other endianness.
_STATE_DTYPE = np.dtype("<i8")
_EMPTY_I64 = np.empty(0, dtype=_STATE_DTYPE)


def _shard_group(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    """One gram-hash shard per micro-batch: a (doc, gram) pair is a
    duplicated window iff the gram was seen in ANY earlier batch (the
    shard's sorted membership array in keyed state) or >= 2 distinct
    docs of THIS batch carry it — the same df >= 2 rule as the batch
    operator.  The NULL key collects the zero-gram docs (explode_outer
    sentinel): they pass through with is_dup = 0 and never touch
    state.  A null int key reaches pandas as NaN, not None, so the
    sentinel test must be pd.isna — `is None` would route empty docs
    into the membership branch where the NaN gram hash silently casts
    to int64-min and registers as a fake gram."""
    batch = pd.concat(list(pdfs), ignore_index=True)
    if pd.isna(key[0]):
        docs = batch.drop_duplicates("doc_id")
        yield pd.DataFrame(
            {
                "doc_id": docs["doc_id"],
                "n_windows": docs["n_windows"],
                "n_grams": docs["n_grams"],
                "is_dup": np.zeros(len(docs), dtype=np.int32),
            }
        )
        return
    pairs = batch.drop_duplicates(["doc_id", "gk"])
    gk = pairs["gk"].to_numpy(dtype=np.int64)
    seen = (
        np.frombuffer(state.get[0], dtype=_STATE_DTYPE)
        if state.exists
        else _EMPTY_I64
    )
    if seen.size:
        pos = np.minimum(np.searchsorted(seen, gk), seen.size - 1)
        in_state = seen[pos] == gk
    else:
        in_state = np.zeros(gk.size, dtype=bool)
    in_batch = pairs.groupby("gk")["doc_id"].transform("size").to_numpy() >= 2
    merged = np.union1d(seen, gk)  # sorted + distinct
    if merged.size != seen.size:
        state.update((merged.astype(_STATE_DTYPE, copy=False).tobytes(),))
    yield pd.DataFrame(
        {
            "doc_id": pairs["doc_id"].to_numpy(),
            "n_windows": pairs["n_windows"].to_numpy(),
            "n_grams": pairs["n_grams"].to_numpy(),
            "is_dup": (in_state | in_batch).astype(np.int32),
        }
    )


def _sharded_gram_source(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    n: int,
    text_col: str,
    id_col: str,
    max_files_per_trigger: int | None,
    n_shards: int,
) -> DataFrame:
    """Streaming ``(doc_id, n_windows, n_grams, gk, shard)`` frame shared
    by the keyed and tiered forms: shingle once, explode with a real-NULL
    sentinel for zero-gram docs — xxhash64(NULL) is a CONSTANT, not NULL,
    so hashing the sentinel would collide every empty doc into one
    legitimate-looking gram key.  pmod(NULL) stays NULL, so sentinel docs
    keep their own NULL-key group and never enter a membership shard."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    docs = reader.parquet(input_dir)
    raw = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        word_shingles(text_col, n).alias("__grams"),
        F.greatest(
            F.size(X.word_tokens(text_col)) - F.lit(n - 1), F.lit(0)
        )
        .cast("long")
        .alias("n_windows"),
    ).withColumn("n_grams", F.size("__grams").cast("long"))
    return (
        raw.select(
            "doc_id",
            "n_windows",
            "n_grams",
            F.explode_outer("__grams").alias("__g"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_grams",
            F.when(F.col("__g").isNull(), F.lit(None).cast("long"))
            .otherwise(F.xxhash64("__g"))
            .alias("gk"),
        )
        .withColumn(
            "shard", F.pmod(F.col("gk"), F.lit(int(n_shards))).cast("int")
        )
    )


def _per_doc_stats(rows: DataFrame) -> DataFrame:
    """Fold per-(doc, gram) flag rows to the batch operator's exact
    per-doc stats contract (shared by the keyed and tiered sinks).  The
    NULL-key sentinel contributes its single is_dup=0 row; real docs sum
    one flag per distinct gram."""
    return (
        rows.groupBy("doc_id")
        .agg(
            F.first("n_windows").alias("n_windows"),
            F.first("n_grams").alias("n_grams"),
            F.sum(
                F.when(F.col("n_grams") > 0, F.col("is_dup")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("n_dup_grams"),
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
        .select(
            "doc_id", "n_windows", "n_grams", "n_dup_grams", "dup_gram_ppm"
        )
    )


def _shard_count_guard(
    spark: SparkSession, checkpoint: str, n_shards: int, what: str
) -> None:
    """Pin ``n_shards`` to the checkpoint: grams are routed to shards by
    ``pmod(gk, n_shards)``, so resuming with a different value would
    probe shards whose state never saw those grams — silent duplicate
    misses.  The pin is an empty marker directory ``_n_shards=<n>``
    inside the checkpoint (existence-only: readable on any Hadoop
    filesystem without open/read plumbing).

    The marker is written BEFORE the stream starts, so a first run that
    dies before any commit leaves a pinned marker over an empty
    checkpoint.  Harmless: resuming with the same n_shards works, and a
    different value errors spuriously but LOUDLY (delete the checkpoint
    dir to truly start over) — preferable to the silent duplicate misses
    an unpinned mismatch would cause."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path
    root = jpath(checkpoint)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    marker = jpath(f"{checkpoint}/_n_shards={int(n_shards)}")
    existing = fs.globStatus(jpath(f"{checkpoint}/_n_shards=*"))
    if existing is not None and len(existing) > 0:
        found = [s.getPath().getName() for s in existing]
        if f"_n_shards={int(n_shards)}" not in found:
            raise ValueError(
                f"{what}: checkpoint {checkpoint} was"
                f" created with {found[0]} but this session asked for"
                f" n_shards={n_shards}; shard routing is part of the"
                " state layout and cannot change on resume"
            )
        return
    fs.mkdirs(marker)


def keyed_substring_stream(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    stats_dir: str,
    checkpoint: str,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = None,
    on_batch=None,
    n_shards: int = 2048,
):
    """Streaming substring-dedup stats over KEYED state (see section
    comment): parquet source -> distinct (doc, gram-hash) explode ->
    per-SHARD stateful dup flags (sorted packed-int64 membership array
    per shard, vectorized searchsorted probes) -> per-doc aggregation in
    foreachBatch with epoch-keyed idempotent stats writes.  Output rows
    carry the batch operator's exact column contract; a single batch
    over a whole corpus equals ``dedup.ngram_dup_stats(min_docs=2)``
    (pinned by test).  ``n_shards`` is pinned to the checkpoint on first
    start and enforced on resume."""
    _shard_count_guard(spark, checkpoint, n_shards, "keyed_substring_stream")
    exploded = _sharded_gram_source(
        spark, input_dir, schema, n, text_col, id_col,
        max_files_per_trigger, n_shards,
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    flagged = exploded.groupBy("shard").applyInPandasWithState(
        _shard_group,
        outputStructType=_KEYED_OUT_SCHEMA,
        stateStructType=_KEYED_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        _per_doc_stats(batch_df).write.mode("overwrite").parquet(
            f"{stats_dir}/epoch={int(epoch_id)}"
        )
        if on_batch is not None:
            on_batch(epoch_id)

    return (
        flagged.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Tiered variant: LSM-shaped state — bounded keyed state + parquet history
# (r06; the fix for the keyed form's corpus-linear per-batch state bytes).
#
# The sharded keyed form above keeps the ENTIRE corpus membership inside
# Spark's state store, so every batch round-trips O(corpus/n_shards ×
# touched shards) bytes JVM→Arrow→Python — sub-linear CPU, linear I/O
# (VERDICT r05 "what's wrong #3").  This variant splits membership the way
# an LSM tree splits writes:
#
# - **History tier** (the gram-store parquet, bucket-partitioned): every
#   gram registered by a COMMITTED epoch.  Loaded ONCE per stream session
#   as a cached static DataFrame and probed with a JVM-side stream-static
#   left join — whole-stage codegen, zero Python transfer.  The snapshot
#   is pinned to epochs <= the checkpoint's last committed batch, so a
#   crashed batch's registrations are invisible on replay (identical
#   novel/dup decisions → exactly-once survives).
# - **Delta tier** (keyed state, sharded as above): ONLY grams first seen
#   during the CURRENT session.  Per-batch state bytes are therefore
#   bounded by session ingest, not corpus size.  On the next session the
#   snapshot has absorbed them (each batch registers its novel grams into
#   the store, epoch-keyed idempotent), so state is purged WHOLESALE via
#   a session marker: state rows written under an older marker are
#   discarded on first touch — every gram they contain is provably in the
#   new snapshot.
#
# Marker soundness: marker = last-committed-epoch + 1 at session start.  A
# gram enters state at epoch e only when absent from the snapshot, and the
# SAME batch registers it into store epoch e; once e commits, any later
# session's snapshot (epochs <= C >= e) contains it — so stored-marker <
# current-marker implies every state gram is snapshot-covered.  Replay of
# the one possible uncommitted epoch E: state restores to its pre-E
# version, the snapshot excludes E's store dir (E > C), and both attempts
# compute identical flags and novel sets.
#
# The per-batch join against the cached snapshot is still corpus-linear
# CPU (nothing answers arbitrary-hash membership without touching a
# corpus-sized structure), but it stays JVM-side, columnar and codegen'd —
# the measured store-scan/keyed gap (91 s vs 7 s, BASELINE.md) came from
# parquet re-scan + shuffle join, both of which the cached snapshot
# avoids.  scripts/substring_stream_probe.py --tiered records batch wall
# AND state bytes at multiple corpus sizes.
# ---------------------------------------------------------------------------

_TIERED_OUT_SCHEMA = (
    "doc_id long, n_windows long, n_grams long, is_dup int,"
    " gk long, novel int"
)
_TIERED_STATE_SCHEMA = "marker long, grams binary"


def _tiered_shard_group(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    """Per-shard flags for the tiered stream: dup iff in the history
    snapshot (``in_hist``, joined JVM-side) OR in this session's keyed
    delta state OR >= 2 docs of this batch.  Emits one row per distinct
    (doc, gram) pair plus ``novel`` marking each gram's single
    registration row.  State stores ONLY non-history grams and is purged
    wholesale when the session marker advances (see section comment).
    The NULL-key sentinel group (zero-gram docs) arrives with a NaN int
    key — pd.isna, not `is None` (see _shard_group)."""
    batch = pd.concat(list(pdfs), ignore_index=True)
    if pd.isna(key[0]):
        docs = batch.drop_duplicates("doc_id")
        yield pd.DataFrame(
            {
                "doc_id": docs["doc_id"],
                "n_windows": docs["n_windows"],
                "n_grams": docs["n_grams"],
                "is_dup": np.zeros(len(docs), dtype=np.int32),
                # gk is consumed only through the novel==1 registration
                # filter; novel is 0 here, so a plain 0 placeholder
                # avoids the nullable-Int64 Arrow cast warning.
                "gk": np.zeros(len(docs), dtype=np.int64),
                "novel": np.zeros(len(docs), dtype=np.int32),
            }
        )
        return
    pairs = batch.drop_duplicates(["doc_id", "gk"])
    gk = pairs["gk"].to_numpy(dtype=np.int64)
    in_hist = pairs["in_hist"].to_numpy(dtype=np.int64) == 1
    marker = int(batch["marker"].iloc[0])
    purged = False
    if state.exists:
        st_marker, st_bytes = state.get
        if int(st_marker) < marker:
            # Previous-session state: every gram in it is in the current
            # snapshot (registered by a committed epoch) — drop it all.
            seen, purged = _EMPTY_I64, True
        else:
            seen = np.frombuffer(st_bytes, dtype=_STATE_DTYPE)
    else:
        seen = _EMPTY_I64
    if seen.size:
        pos = np.minimum(np.searchsorted(seen, gk), seen.size - 1)
        in_state = seen[pos] == gk
    else:
        in_state = np.zeros(gk.size, dtype=bool)
    in_batch = pairs.groupby("gk")["doc_id"].transform("size").to_numpy() >= 2
    fresh = ~in_hist & ~in_state
    merged = np.union1d(seen, gk[fresh])
    if merged.size != seen.size or purged:
        state.update(
            (marker, merged.astype(_STATE_DTYPE, copy=False).tobytes())
        )
    # One registration row per fresh gram (first occurrence in shard
    # order): shards partition the gk space, so this is globally unique.
    first_occ = ~pd.Series(gk).duplicated().to_numpy()
    yield pd.DataFrame(
        {
            "doc_id": pairs["doc_id"].to_numpy(),
            "n_windows": pairs["n_windows"].to_numpy(),
            "n_grams": pairs["n_grams"].to_numpy(),
            "is_dup": (in_hist | in_state | in_batch).astype(np.int32),
            "gk": gk,
            "novel": (fresh & first_occ).astype(np.int32),
        }
    )


def _newest_log_entry(
    spark: SparkSession, checkpoint: str, subdir: str
) -> int | None:
    """The newest numeric entry of a checkpoint log dir (``commits`` =
    last committed batch; ``offsets`` = last STARTED batch), or None if
    the dir is absent/empty."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path
    d = jpath(f"{checkpoint}/{subdir}")
    fs = d.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(d):
        return None
    best = None
    for st in fs.listStatus(d):
        name = st.getPath().getName()
        if name.isdigit():
            best = int(name) if best is None else max(best, int(name))
    return best


_STORE_MARKER = "_store_registered"


def _mark_store_written(spark: SparkSession, checkpoint: str) -> None:
    """Record in the CHECKPOINT that at least one gram was ever
    registered into the store (empty existence-marker dir, idempotent).
    Lets a later session distinguish 'no grams ever registered'
    (snapshot legitimately empty) from 'store deleted behind a kept
    checkpoint' (silent-miss corruption — must refuse loudly)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path
    marker = jpath(f"{checkpoint}/{_STORE_MARKER}")
    fs = marker.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(marker):
        fs.mkdirs(marker)


def _store_marker_exists(spark: SparkSession, checkpoint: str) -> bool:
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path
    marker = jpath(f"{checkpoint}/{_STORE_MARKER}")
    fs = marker.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(marker))


def _session_history_guards(
    spark: SparkSession, checkpoint: str, gram_dir: str, what: str
) -> Tuple[int | None, "DataFrame | None"]:
    """Session-start consistency guards shared by the history-tier stream
    forms (tiered, bloom): returns ``(committed, store)`` where
    ``committed`` is the checkpoint's last committed batch (None for a
    fresh checkpoint) and ``store`` the opened gram store (None if
    absent).  Refuses loudly on every checkpoint/store mismatch that
    would otherwise silently destroy or forget accepted corpus history:

    - store missing behind a checkpoint that ever registered a gram;
    - flat (non-epoch) store layout under an epoch-keyed stream;
    - brand-new checkpoint (no batch ever STARTED — offsets are written
      before a batch runs, so even a crashed first batch leaves one)
      against a store with history: the new stream's epoch 0 would
      OVERWRITE the old epoch=0 registrations;
    - store epochs ahead of what the checkpoint committed + the one
      replayable batch: the pair is from different streams."""
    committed = _newest_log_entry(spark, checkpoint, "commits")
    started = _newest_log_entry(spark, checkpoint, "offsets")
    store = read_store(spark, gram_dir)
    if store is None:
        # A checkpoint that ever registered a gram (marker) must find its
        # store: proceeding would treat every known gram as novel — the
        # silent corpus-history loss read_store's contract forbids.
        if _store_marker_exists(spark, checkpoint):
            raise ValueError(
                f"{what}: checkpoint {checkpoint} has"
                f" registered grams but the store {gram_dir} is missing"
                " (deleted or wrong path?).  Continuing would silently"
                " forget the whole corpus history; restore the store or"
                " start a fresh checkpoint."
            )
        return committed, None
    if "epoch" not in store.columns:
        raise ValueError(
            f"{what}: gram store was written flat"
            " (direct batch-twin mode); this stream registers"
            " epoch-keyed — use a fresh store directory."
        )
    max_epoch = store.agg(F.max("epoch")).first()[0]
    floor = -1 if committed is None else int(committed)
    if max_epoch is not None and started is None:
        raise ValueError(
            f"{what}: store {gram_dir} has history"
            f" (epoch {int(max_epoch)}) but checkpoint {checkpoint}"
            " is brand new — writing would silently destroy accepted"
            " state; use a fresh store or restore the matching"
            " checkpoint."
        )
    if max_epoch is not None and int(max_epoch) > floor + 1:
        raise ValueError(
            f"{what}: store has epoch {int(max_epoch)}"
            f" but the checkpoint committed only through {floor} — the"
            " checkpoint and store are from different streams (fresh/"
            "deleted checkpoint against an existing store?).  Writing"
            " would silently destroy accepted state; use a fresh store"
            " or restore the matching checkpoint."
        )
    return committed, store


def tiered_substring_stream(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    gram_dir: str,
    stats_dir: str,
    checkpoint: str,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = None,
    on_batch=None,
    n_shards: int = 2048,
):
    """Streaming substring-dedup stats with LSM-TIERED membership (see
    section comment): committed history in a cached bucket-partitioned
    parquet snapshot probed JVM-side, session-novel grams in bounded
    keyed state, per-batch registration of novel grams into the store
    (epoch-keyed idempotent).  Same output contract as the sibling
    forms; a single batch over a whole corpus equals
    ``dedup.ngram_dup_stats(min_docs=2)``."""
    _shard_count_guard(spark, checkpoint, n_shards, "tiered_substring_stream")
    committed, store = _session_history_guards(
        spark, checkpoint, gram_dir, "tiered_substring_stream"
    )
    snapshot = None
    if store is not None:
        if committed is not None:
            # Persist the snapshot PRE-SHUFFLED and PRE-SORTED on the join
            # key: the cached InMemoryRelation then reports
            # HashPartitioning(gk, shuffle.partitions) + per-partition gk
            # order, so each micro-batch's stream-static sort-merge join
            # exchanges and sorts ONLY the batch side — the corpus-sized
            # side is a memory-speed merge scan, no per-batch shuffle.
            # (Micro-batch plans don't run AQE, so the partition-count
            # match is stable across batches.)
            # Some runtimes set this conf to a non-numeric value (e.g.
            # "auto" under auto-optimized shuffle); any partition count
            # is CORRECT here — it only sizes the snapshot's hash
            # layout — so fall back rather than fail startup.
            try:
                n_part = int(
                    spark.conf.get("spark.sql.shuffle.partitions", "200")
                )
            except ValueError:
                n_part = max(store.rdd.getNumPartitions(), 32)
            snapshot = (
                store.filter(F.col("epoch") <= int(committed))
                .select("gk")
                .withColumn("in_hist", F.lit(1))
                .repartition(n_part, "gk")
                .sortWithinPartitions("gk")
                .persist()
            )
            snapshot.count()  # materialize once; every batch reuses it
    marker = 0 if committed is None else int(committed) + 1

    exploded = _sharded_gram_source(
        spark, input_dir, schema, n, text_col, id_col,
        max_files_per_trigger, n_shards,
    )
    if snapshot is not None:
        joined = exploded.join(snapshot, "gk", "left").withColumn(
            "in_hist", F.coalesce(F.col("in_hist"), F.lit(0))
        )
    else:
        joined = exploded.withColumn("in_hist", F.lit(0))
    keyed = joined.withColumn("marker", F.lit(int(marker)).cast("long"))

    from pyspark.sql.streaming.state import GroupStateTimeout

    flagged = keyed.groupBy("shard").applyInPandasWithState(
        _tiered_shard_group,
        outputStructType=_TIERED_OUT_SCHEMA,
        stateStructType=_TIERED_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # Two consumers (stats + registration): materialize once.
        rows = batch_df.localCheckpoint(eager=True)
        _per_doc_stats(rows).write.mode("overwrite").parquet(
            f"{stats_dir}/epoch={int(epoch_id)}"
        )
        novel = (
            rows.filter(F.col("novel") == 1)
            .select("gk")
            .withColumn("bucket", F.pmod(F.col("gk"), F.lit(N_BUCKETS)))
        )
        if write_store_partitioned(novel, gram_dir, "bucket", epoch_id):
            _mark_store_written(spark, checkpoint)
        if on_batch is not None:
            on_batch(epoch_id)

    query = (
        flagged.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if snapshot is not None:
        # The snapshot cache belongs to THIS session only — release it
        # when the query ends, or back-to-back sessions in one
        # SparkSession (the probe; any periodic-ingest app) pin one
        # corpus-sized InMemoryRelation per session until the app dies.
        import threading

        def _release(q=query, s=snapshot):
            try:
                q.awaitTermination()
            except Exception:
                pass  # stream failure still releases the cache
            finally:
                s.unpersist()

        threading.Thread(
            target=_release, name="tiered-snapshot-release", daemon=True
        ).start()
    return query


# ---------------------------------------------------------------------------
# Bloom-screened variant (r07, artifact-incremental since r08): bounded-
# memory history with PERSISTED membership structures — the 100 TB form.
#
# The tiered form above bounds keyed STATE by session ingest, but still
# loads the committed gram history as a corpus-sized cached DataFrame and
# merge-scans it every micro-batch.  This variant keeps the history ON
# DISK and answers membership the way an LSM tree serves point reads:
#
# - **History tier** (disk): the epoch-keyed, bucket-partitioned gram
#   store, with each registration written gk-SORTED within its bucket
#   files — sorted runs.  Never cached, never scanned wholesale.
# - **Bloom screen** (per-bucket bitmaps, persisted): one bitmap PER
#   BUCKET, maintained incrementally as store artifacts
#   (streaming/bloomstore.py) at a constant bits/gram budget.  Probe
#   tasks are bucket-partitioned and each loads only its buckets'
#   bitmap files (worker-cached) — executor memory is O(tasks x
#   per-bucket bitmap), never the total, so the bits/gram budget holds
#   at any corpus (a bucket that outgrows it is rebuilt at the next
#   power of two from its own 1/N_BUCKETS history slice).  A negative
#   answer is definite — the overwhelmingly common novel-gram case
#   costs ZERO history I/O.
# - **Exact verify** (disk point lookups): only Bloom-POSITIVE grams
#   are checked against the sorted runs, by reading ONLY the parquet
#   row groups whose min/max gk range covers a probe (the persisted run
#   index).  Probe keys are uniform hashes, so min/max pruning is
#   useless for a FULL batch (BASELINE.md r06) but the verify set is
#   SPARSE (true duplicates + Bloom false positives), which is exactly
#   when row-group statistics do prune: I/O per batch is
#   O(verify_gks x row-group), not O(corpus).
# - **Session delta** (disk, session-bounded): grams registered by THIS
#   session's committed epochs live in their own small epoch dirs,
#   probed with a plain per-batch join.
#
# Session start is O(new runs), not O(corpus) (VERDICT r7 next-round
# #1): bloomstore.ensure_artifacts folds only store epochs above the
# manifest watermark into the bitmaps (the previous session's novel
# grams) and footer-reads only files the persisted run index does not
# already cover; the first-ever session pays the one full build every
# r7 session paid.  Per-epoch, the sink appends the just-written files'
# footer entries to the persisted index (bitmap files are NOT rewritten
# per epoch — that would cost the full bitmap bytes per batch; the next
# session start folds the session's epochs).
#
# Exactly-once rides the same epoch bookkeeping as the sibling forms:
# the history cut is pinned to epochs <= the checkpoint's last committed
# batch at session start, stats/registration writes are epoch-keyed
# idempotent overwrites, and the session delta excludes the current
# epoch — so a replayed batch sees byte-identical membership answers.
# Artifacts are advisory and Bloom bits are monotone ORs over
# byte-identical replayed gram sets, so artifact maintenance that ran
# ahead of a crashed commit is idempotent (bloomstore module docstring).
# ---------------------------------------------------------------------------

from .bloomstore import (  # noqa: E402  (section-local import by design)
    _bloom_probe,
    append_run_entries,
    bitmap_for,
    ensure_artifacts,
    open_parquet,
)


def bloom_substring_stream(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    gram_dir: str,
    stats_dir: str,
    checkpoint: str,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = None,
    on_batch=None,
    bloom_bytes: int | None = None,
    bits_per_gram: float = 10.0,
    max_bucket_bloom_bytes: int = 256 * 1024 * 1024,
    metrics: dict | None = None,
    compact_every: int | None = None,
    auto_compact_runs: int | None = 8,
):
    """Streaming substring-dedup stats with BOUNDED-MEMORY history (see
    section comment): per-bucket persisted Bloom bitmaps screen batch
    grams, only positives are verified by row-group point lookups into
    the sorted on-disk runs, session-novel grams are answered by the
    session's own epoch dirs.  Same output contract as the sibling
    forms; a single batch over a whole corpus equals
    ``dedup.ngram_dup_stats(min_docs=2)``.

    ``bloom_bytes`` is an EXPLICIT fixed TOTAL bitmap budget (split
    evenly across buckets, no growth); when None each bucket is sized at
    ``bits_per_gram`` bits per gram it holds and REBUILT at the next
    power of two when it outgrows that budget, up to
    ``max_bucket_bloom_bytes`` per bucket (10 bits/gram ~ 1% false
    positives at any corpus; a bucket pinned at its cap degrades to a
    higher verify rate, never to wrong answers or more memory —
    test-pinned by the undersized-cap exactness test).  ``metrics``, if
    given, receives one dict per epoch (bloom/verify/row-group counters
    plus the session-start ``setup_*`` reconcile counters) — the probe's
    observability hook.

    ``compact_every=K`` folds the PRE-SESSION history runs (epochs below
    the session floor — never a session-registered epoch, which the
    delta probe still reads and a replayed batch overwrites) into one
    sorted run per bucket after every K-th epoch, via
    ``compact_store(below_epoch=floor)``, then reconciles the persisted
    run index against the folded files; verify row-group reads return
    to the one-run floor.  The Bloom bitmaps are membership-equivalent
    before and after a fold, so they are NOT rebuilt.  A restart after
    a mid-swap death repairs the store at session start, before the
    guards or the artifact reconcile read it.

    ``auto_compact_runs`` (default 8) is the UNATTENDED compaction
    policy (VERDICT r8 next-round #4): at session start, if any bucket's
    committed history holds MORE than this many run files (the
    persisted run index counts them — one file per touched bucket per
    epoch), the pre-session history is folded to one run per bucket
    right there, before the first batch — the same single-writer window
    a manual maintenance call uses, since the streaming query has not
    started.  Within a session the pre-session set only shrinks (the
    session's own epochs are delta-probed, not history), so a
    session-start check is the complete policy: runs/bucket is bounded
    by ``auto_compact_runs + epochs-per-session`` across ANY number of
    sessions with no manual ``compact_store`` call, and verify
    row-group reads stay capped instead of growing with session count
    (scripts/substring_stream_probe.py --auto-compact).  ``None``
    disables the policy."""
    from .stores import recover_store

    # Unconditional: a crash inside a MANUAL maintenance-window
    # compact_store swap followed by a restart WITHOUT inline
    # compaction must still be repaired before the store is read
    # (cheap glob no-op when no swap was interrupted).
    recover_store(spark, gram_dir)
    committed, store = _session_history_guards(
        spark, checkpoint, gram_dir, "bloom_substring_stream"
    )
    sc = spark.sparkContext
    desc_bc = index_bc = None
    m_bytes = k_hashes = n_hist = 0
    setup_metrics: dict = {}
    if store is not None and committed is not None:
        art = ensure_artifacts(
            spark,
            gram_dir,
            int(committed),
            bits_per_gram=bits_per_gram,
            fixed_total_bytes=bloom_bytes,
            max_bucket_bytes=max_bucket_bloom_bytes,
            n_buckets=N_BUCKETS,
            metrics=setup_metrics,
        )
        # Unattended maintenance (see docstring): fold the pre-session
        # history when any bucket's run count crossed the threshold.
        # The stream has not started, so this IS the single-writer
        # window; bitmaps are membership-equivalent across the fold and
        # only the run index is reconciled (new consolidated paths in,
        # dead paths out — no bitmap rebuild, watermark unchanged).
        runs_max = (
            max((len(v) for v in art["index"].values()), default=0)
            if art is not None
            else 0
        )
        # Observability: pre-policy committed-history runs/bucket maximum
        # (the number the unattended policy bounds) — probe-readable as
        # ``setup_runs_max`` in every epoch's metrics entry.
        setup_metrics["runs_max"] = runs_max
        if (
            auto_compact_runs is not None
            and runs_max > int(auto_compact_runs)
        ):
            from .stores import compact_store

            result = compact_store(
                spark, gram_dir, "bucket", sort_cols=["gk"],
                below_epoch=int(committed) + 1,
            )
            if result.get("compacted"):
                art = ensure_artifacts(
                    spark,
                    gram_dir,
                    int(committed),
                    bits_per_gram=bits_per_gram,
                    fixed_total_bytes=bloom_bytes,
                    max_bucket_bytes=max_bucket_bloom_bytes,
                    n_buckets=N_BUCKETS,
                )
                setup_metrics["auto_compacted_from_runs"] = runs_max
        if art is not None and art["total_grams"] > 0:
            k_hashes = art["k"]
            m_bytes = art["total_bytes"]
            n_hist = art["total_grams"]
            # Both broadcasts are MANIFEST-sized (paths + footer stats,
            # ~24 B/row group) — bitmap bytes stay on disk and are read
            # per bucket by the probe tasks.
            desc_bc = sc.broadcast(art["buckets"])
            index_bc = sc.broadcast(art["index"])
    session_epochs: set[int] = set()
    rg_reads = sc.accumulator(0)
    verify_acc = sc.accumulator(0)
    n_verify_parts = max(1, min(N_BUCKETS, sc.defaultParallelism))

    def screen_verify(pairs: DataFrame) -> DataFrame:
        """Fused Bloom screen + exact verify over bucket-partitioned
        batch grams: each task loads only its buckets' bitmap files
        (worker-cached, version-stamped names), probes the screen, and
        binary-searches the run index for candidate row groups to read
        for the (sparse) positive set."""
        k = k_hashes  # close over plain ints, not the session objects
        d_bc = desc_bc

        def probe(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            desc = d_bc.value
            idx = index_bc.value
            for pdf in it:
                if not len(pdf):
                    continue
                for b, grp in pdf.groupby("bucket"):
                    gks = np.unique(grp["gk"].to_numpy(np.int64))
                    entry = desc.get(int(b))
                    if entry is None:
                        pos = np.zeros(gks.size, dtype=bool)
                    else:
                        pos = _bloom_probe(gks, bitmap_for(entry[0]), k)
                    hit = np.zeros(gks.size, dtype=bool)
                    probes = gks[pos]
                    if probes.size:
                        verify_acc.add(int(probes.size))
                        sub = np.zeros(probes.size, dtype=bool)
                        for path, mins, maxs in idx.get(int(b), []):
                            if sub.all():
                                break
                            if mins is None:
                                pf = open_parquet(path)
                                cand = np.arange(
                                    pf.metadata.num_row_groups
                                )
                            else:
                                lo = np.searchsorted(probes, mins, "left")
                                hi = np.searchsorted(probes, maxs, "right")
                                cand = np.nonzero(hi > lo)[0]
                                pf = (
                                    open_parquet(path) if cand.size else None
                                )
                            for rg in cand:
                                col = (
                                    pf.read_row_group(
                                        int(rg), columns=["gk"]
                                    )
                                    .column("gk")
                                    .to_numpy()
                                )
                                sub |= np.isin(probes, col)
                            rg_reads.add(int(cand.size))
                        hit[pos] = sub
                    yield pd.DataFrame(
                        {
                            "gk": gks,
                            "bucket": np.full(gks.size, int(b), np.int64),
                            "bloom_pos": pos.astype(np.int32),
                            "in_hist": hit.astype(np.int32),
                        }
                    )

        return pairs.repartition(n_verify_parts, "bucket").mapInPandas(
            probe, "gk long, bucket long, bloom_pos int, in_hist int"
        )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        nonlocal index_bc, desc_bc, k_hashes, m_bytes, n_hist
        verify_before = verify_acc.value
        # r12 (guide §2.4): materialize the shingle projection ONCE.
        # base and g were each eager-checkpointed straight off the
        # un-materialized raw, so the whole-batch word_shingles HOF
        # projection (the dominant per-batch compute) ran twice.  One
        # boundary on (id, grams, n_windows) and both derive from the
        # in-memory gram arrays instead; base needs no boundary of its
        # own (single consumer, cheap scan of the checkpoint).
        raw = spread(batch_df).select(
            F.col(id_col).cast("long").alias("id"),
            word_shingles(text_col, n).alias("grams"),
            F.greatest(
                F.size(X.word_tokens(text_col)) - F.lit(n - 1), F.lit(0)
            )
            .cast("long")
            .alias("n_windows"),
        ).localCheckpoint(eager=True)
        base = raw.select(
            "id", "n_windows", F.size("grams").cast("long").alias("n_grams")
        )
        g = (
            raw.select("id", F.explode("grams").alias("__g"))
            .select("id", F.xxhash64("__g").alias("gk"))
            .withColumn("bucket", F.pmod(F.col("gk"), F.lit(N_BUCKETS)))
            .localCheckpoint(eager=True)
        )
        batch_dup = (
            g.groupBy("gk")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") >= 2)
            .select("gk")
        )
        batch_gk = g.select("gk", "bucket").distinct()
        if desc_bc is not None:
            screened = screen_verify(batch_gk)
        else:
            screened = batch_gk.select(
                "gk",
                "bucket",
                F.lit(0).alias("bloom_pos"),
                F.lit(0).alias("in_hist"),
            )
        # Session delta: grams registered by THIS session's earlier
        # epochs (exact, session-bounded).  The current epoch is never in
        # the set, so a replayed batch cannot see its own earlier write.
        # (Delta grams are not in the pre-session bitmaps, so the fused
        # verify above only touches them at the Bloom FP rate.)
        delta_paths = [
            f"{gram_dir}/epoch={e}"
            for e in sorted(session_epochs)
            if e < int(epoch_id)
        ]
        if delta_paths:
            # basePath: with TWO OR MORE epoch dirs Spark's partition
            # discovery refuses the "conflicting directory structures"
            # it infers from sibling epoch=N roots; anchoring discovery
            # at the store root makes epoch/bucket ordinary partition
            # columns.  (Latent until a session drained 3+ micro-batches
            # — every earlier probe was one-arrival-per-session; caught
            # by the r10 steady-state probe's first run.)
            delta = (
                spark.read.option("basePath", gram_dir)
                .parquet(*delta_paths)
                .select("gk")
                .distinct()
            )
            known = screened.join(
                delta.withColumn("in_delta", F.lit(1)), "gk", "left"
            ).withColumn("in_delta", F.coalesce("in_delta", F.lit(0)))
        else:
            known = screened.withColumn("in_delta", F.lit(0))
        known = known.localCheckpoint(eager=True)
        dup_keys = (
            batch_dup.unionByName(
                known.filter(
                    (F.col("in_delta") == 1) | (F.col("in_hist") == 1)
                ).select("gk")
            )
            .distinct()
        )
        per_doc = (
            g.join(dup_keys, "gk", "left_semi")
            .groupBy("id")
            .agg(F.count("*").alias("n_dup_grams"))
        )
        stats = (
            base.join(per_doc, "id", "left")
            .select(
                F.col("id").alias(id_col),
                "n_windows",
                "n_grams",
                F.coalesce("n_dup_grams", F.lit(0))
                .cast("long")
                .alias("n_dup_grams"),
            )
            .withColumn(
                "dup_gram_ppm",
                F.when(
                    F.col("n_grams") > 0,
                    F.expr(
                        "(n_dup_grams * CAST(1000000 AS BIGINT))"
                        " div n_grams"
                    ),
                )
                .otherwise(F.lit(0))
                .cast("long"),
            )
        )
        stats.write.mode("overwrite").parquet(
            f"{stats_dir}/epoch={int(epoch_id)}"
        )
        # Register novel grams as SORTED runs: repartition puts each
        # bucket in exactly one task, the sort makes every output file a
        # gk-sorted run — tight disjoint row-group ranges for later
        # sessions' point lookups.
        novel = (
            known.filter(
                (F.col("in_hist") == 0) & (F.col("in_delta") == 0)
            )
            .select("gk", "bucket")
            .repartition(n_verify_parts, "bucket")
            .sortWithinPartitions("bucket", "gk")
        )
        if write_store_partitioned(novel, gram_dir, "bucket", epoch_id):
            _mark_store_written(spark, checkpoint)
            session_epochs.add(int(epoch_id))
            # Per-epoch index maintenance: footer-read ONLY the files
            # just written and append them to the persisted run index
            # (no-op before the first manifest exists; bitmaps fold at
            # the next session start — see section comment).
            append_run_entries(spark, gram_dir, int(epoch_id))
        if (
            compact_every is not None
            and committed is not None
            and epoch_id > 0
            and epoch_id % int(compact_every) == 0
        ):
            from .stores import compact_store

            floor = int(committed) + 1
            result = compact_store(
                spark, gram_dir, "bucket", sort_cols=["gk"],
                below_epoch=floor,
            )
            if result.get("compacted"):
                # Reconcile the PERSISTED index against the folded files
                # (dead run entries dropped, consolidated runs footer-
                # read once) and refresh BOTH live broadcasts from it:
                # if the reconcile folded pending epochs it wrote new
                # version-stamped bitmap files and GC'd the old ones, so
                # a stale bucket-descriptor broadcast would point probe
                # tasks at deleted files (r8 review finding).
                art2 = ensure_artifacts(
                    spark,
                    gram_dir,
                    int(committed),
                    bits_per_gram=bits_per_gram,
                    fixed_total_bytes=bloom_bytes,
                    max_bucket_bytes=max_bucket_bloom_bytes,
                    n_buckets=N_BUCKETS,
                )
                old_i, old_d = index_bc, desc_bc
                index_bc = sc.broadcast(
                    {} if art2 is None else art2["index"]
                )
                desc_bc = sc.broadcast(
                    {} if art2 is None else art2["buckets"]
                )
                if art2 is not None:
                    k_hashes = art2["k"]
                    m_bytes = art2["total_bytes"]
                    n_hist = art2["total_grams"]
                for old in (old_i, old_d):
                    if old is not None:
                        old.unpersist()
        if metrics is not None:
            entry = {
                "bloom_bytes": m_bytes,
                "k_hashes": k_hashes,
                "hist_grams": n_hist,
                "batch_gks": known.count(),
                "verify_gks": verify_acc.value - verify_before,
                "rg_reads_total": rg_reads.value,
            }
            for sk, sv in setup_metrics.items():
                entry[f"setup_{sk}"] = sv
            metrics[int(epoch_id)] = entry
        if on_batch is not None:
            on_batch(epoch_id)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", int(max_files_per_trigger)
        )
    return (
        reader.parquet(input_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
