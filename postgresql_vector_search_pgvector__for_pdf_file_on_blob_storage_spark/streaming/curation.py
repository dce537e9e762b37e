"""Incremental corpus-curation maintenance — the batch curation pipeline
(operators/dedup.curate_corpus) as an ARRIVAL-batch composition of the
incremental state forms this package already ships (VERDICT r10
next-round #7): a real corpus ingests continuously, so gate / exact-dedup
/ near-dup state must be maintained per micro-batch, with the accepted
SURVIVOR set converging to what the batch pipeline computes over the
drained corpus.

Composition per micro-batch (all DataFrame algebra, ``foreachBatch``):

1. **Quality gate** — stateless scan predicates (language allow-list +
   token-count floor), exactly ``curate_corpus``'s gate.
2. **Fingerprint log** — one ``(fp, id, lang, n_tokens)`` row per gated
   doc appended to a parquet log (epoch-keyed overwrite, so a replayed
   micro-batch rewrites exactly its own rows — the neardup-store
   convention).  The log is append-only per batch; min-id-per-fp is a
   property of the SET, computed at read time, so arrival order cannot
   change the converged answer.
3. **Near-dup pair maintenance** — :func:`streaming.neardup.
   detect_and_register`: new docs band-probe the persistent band store,
   candidates exact-verify over the shingle store, verified pairs append
   to the matches log.  Candidate cost per batch tracks true near-dups
   (banding), never batch x corpus.

:func:`curation_survivors` derives the accepted-survivor view from the
three logs: min-id per fingerprint (exact_dups counted), star-contraction
components over the verified pairs RESTRICTED to the exact-dedup keepers,
drop non-representatives.  Why restriction gives batch-exact semantics:
``curate_corpus`` computes its pair graph over the exact-dedup SURVIVORS,
while the stream registers every gated doc — but a MinHash signature is a
per-document function, so a kept-kept pair bands together in the stream
iff it bands together in the batch operator, and the verify Jaccard is
the same full-shingle-set expression; pairs with a dropped-duplicate
endpoint are exactly the rows the restriction removes.  Hence
``curation_survivors`` == ``curate_corpus(use_minhash=True,
max_df=None)`` row-for-row after draining the same corpus — the
``streaming_curation_maintenance`` driver query carries that bag diff as
its ``batch_diff_rows`` witness, and tests/test_streaming.py pins it
across arrival orders and a multi-batch stream.

100 TB shape: per-batch work is (scan predicates + an 8-byte fingerprint
projection + the banded candidate join); every store is a parquet table
(restart-safe, no executor-memory state); the survivor view's only
corpus-sized fold is the min-per-fp aggregate over 8-byte keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as X
from ..operators import dedup as D
from ..utils import spread
from . import neardup as ND

__all__ = [
    "curation_gate",
    "curation_maintain_batch",
    "curation_maintenance_stream",
    "curation_survivors",
]


def curation_gate(
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    langs: tuple[str, ...] = ("en", "de", "fr"),
    min_tokens: int = 25,
) -> DataFrame:
    """The stateless gate — identical predicates to ``curate_corpus``'s
    first stage, normalized to ``(id, lang, text, n_tokens)``."""
    return (
        spread(batch)
        .select(
            F.col(id_col).alias("id"),
            F.col(lang_col).alias("lang"),
            F.col(text_col).alias("text"),
            F.size(X.word_tokens(text_col)).cast("long").alias("n_tokens"),
        )
        .filter(
            F.col("lang").isin(*langs) & (F.col("n_tokens") >= min_tokens)
        )
    )


def curation_maintain_batch(
    batch: DataFrame,
    store_root: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    langs: tuple[str, ...] = ("en", "de", "fr"),
    min_tokens: int = 25,
    threshold: float = 0.8,
    epoch_id: int | None = None,
) -> None:
    """Process one (micro-)batch of arriving documents: gate, append the
    gated docs' fingerprint rows to ``<store_root>/fps``, and maintain
    the near-dup band/shingle/matches stores.  Callable directly on a
    static DataFrame (the arrival-order tests) or from ``foreachBatch``.
    """
    gated = curation_gate(
        batch, text_col, id_col, lang_col, langs, min_tokens
    ).localCheckpoint(eager=True)  # one gate pass feeds both stores
    fps = gated.select(
        X.fingerprint64("text").alias("fp"), "id", "lang", "n_tokens"
    )
    if epoch_id is None:
        fps.write.mode("append").parquet(f"{store_root}/fps")
    else:
        fps.write.mode("overwrite").parquet(
            f"{store_root}/fps/epoch={int(epoch_id)}"
        )
    ND.detect_and_register(
        gated,
        f"{store_root}/bands",
        f"{store_root}/shingles",
        f"{store_root}/matches",
        text_col="text",
        id_col="id",
        threshold=threshold,
        epoch_id=epoch_id,
    )


def curation_survivors(spark: SparkSession, store_root: str) -> DataFrame:
    """The accepted-survivor view over the maintenance stores:
    ``(id, lang, n_tokens, exact_dups)`` — converges to
    ``curate_corpus(use_minhash=True, max_df=None)`` over the drained
    corpus (see module doc for why the kept-kept restriction is exact).
    Lazy scans over the logs; no driver-side collection."""
    fps = spark.read.option("basePath", f"{store_root}/fps").parquet(
        f"{store_root}/fps"
    ).select("fp", "id", "lang", "n_tokens")
    keep = (
        fps.select("fp", "id")
        .groupBy("fp")
        .agg(
            F.min("id").alias("id"),
            F.count("*").cast("long").alias("exact_dups"),
        )
        .drop("fp")
    )
    kept = fps.select("id", "lang", "n_tokens").join(keep, "id")
    from .stores import read_store

    matches = read_store(spark, f"{store_root}/matches")
    if matches is None:
        return kept.select("id", "lang", "n_tokens", "exact_dups")
    kept_ids = kept.select("id")
    pairs = (
        matches.select(
            F.col("new_id").alias("id_a"), F.col("matched_id").alias("id_b")
        )
        .join(kept_ids.withColumnRenamed("id", "id_a"), "id_a")
        .join(kept_ids.withColumnRenamed("id", "id_b"), "id_b")
    )
    dropped = (
        D.connected_components_star(pairs)
        .filter(F.col("node") != F.col("cluster"))
        .select(F.col("node").alias("id"))
    )
    return kept.join(dropped, "id", "left_anti").select(
        "id", "lang", "n_tokens", "exact_dups"
    )


def curation_maintenance_stream(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    store_root: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    langs: tuple[str, ...] = ("en", "de", "fr"),
    min_tokens: int = 25,
    threshold: float = 0.8,
    max_files_per_trigger: int | None = None,
):
    """Streaming wrapper: parquet-directory source -> per-micro-batch
    :func:`curation_maintain_batch`.  AvailableNow drains the backlog and
    stops; restarting with the same checkpoint processes only new files,
    and the fingerprint/band/shingle/matches stores carry accepted state
    across sessions — call :func:`curation_survivors` any time for the
    current accepted set."""
    from .stores import recover_store

    recover_store(spark, f"{store_root}/bands")

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        curation_maintain_batch(
            batch_df,
            store_root,
            text_col=text_col,
            id_col=id_col,
            lang_col=lang_col,
            langs=langs,
            min_tokens=min_tokens,
            threshold=threshold,
            epoch_id=epoch_id,
        )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", int(max_files_per_trigger)
        )
    return (
        reader.parquet(input_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
