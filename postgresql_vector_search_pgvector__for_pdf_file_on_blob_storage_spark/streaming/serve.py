"""Streaming serving path — the reference's query side as a streaming job.

Reference (SURVEY.md §3.2): each ``POST /openai-gpt4-sse-submit`` embeds the
user's text, runs the pgvector top-5, and streams per-hit events back over
SSE (SSEOpenAIController.java:136-239).  Here the submit endpoint becomes a
*stream of probe rows* ``(user_id, query_text)``; every micro-batch is
embedded (Arrow-batched UDF), kNN-joined against the static chunks table
with the bounded per-partition top-k (operators/knn.knn_join — shuffled
bytes O(partitions × probes × k), the only viable shape when the item side
is 100 TB), and appended to the output sink.  The SSE projection
(pipeline.sse_events) is a downstream batch op over the emitted hits.

``foreachBatch`` is the right tool: a micro-batch of probes is small, the
chunks side is static, and the batch kNN join — including its broadcast of
the probe side — is reused verbatim, so the streaming and interactive
serving paths cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import embed as E
from ..operators import knn as K


def batch_search(
    probes: DataFrame,
    chunks: DataFrame,
    k: int = 5,
    dim: int = E.DEFAULT_DIM,
) -> DataFrame:
    """Top-k chunks per probe row ``(user_id, query_text)`` — the per-batch
    kernel of :func:`serve_search_stream`, reusable in batch serving.
    Returns ``(user_id, query_text, rank, id, origntext, fileName,
    pageNumber, dist)``."""
    from pyspark.sql.window import Window

    # Probe ids: duplicate submissions (same user, same text — normal in
    # serving) must stay separate probes.  Number occurrences WITHIN each
    # (user, text) group — a keyed window, so the work spreads across the
    # cluster (identical rows are interchangeable, making the assignment
    # deterministic under micro-batch recomputation) — then build a
    # collision-free composite key.  An earlier version used a global
    # row_number() (Exchange SinglePartition): fine for a micro-batch,
    # silently serializing for a large offline probe table (VERDICT r01);
    # tests assert no single-partition exchange remains.
    occ = F.row_number().over(
        Window.partitionBy("user_id", "query_text").orderBy(F.lit(1))
    )
    embedded = probes.select(
        "user_id",
        "query_text",
        E.hash_embedder(dim)(F.col("query_text")).alias("embedding"),
    ).withColumn(
        "probe_id",
        F.concat_ws("\x1f", "user_id", "query_text", occ.cast("string")),
    )
    hits = K.knn_join(
        embedded.select("probe_id", "embedding"),
        chunks.select(F.col("id").alias("item_id"), "embedding"),
        k=k,
        metric="l2",
    )
    payload = chunks.select(
        F.col("id").alias("item_id"), "origntext", "fileName", "pageNumber"
    )
    return (
        hits.join(
            embedded.select("probe_id", "user_id", "query_text"), "probe_id"
        )
        .join(payload, "item_id")
        .select(
            "user_id",
            "query_text",
            "rank",
            F.col("item_id").alias("id"),
            "origntext",
            "fileName",
            "pageNumber",
            "dist",
        )
    )


def serve_push_stream(
    probes_stream: DataFrame,
    chunks: DataFrame,
    sink_factory,
    checkpoint: str,
    k: int = 5,
    dim: int = E.DEFAULT_DIM,
    processing_time: str | None = None,
):
    """Continuous PUSH serving — the reference's SSE emitter made literal
    (SSEOpenAIController.java:96-133): each micro-batch's hits expand to
    the ordered create/createLink/addMessage event rows
    (pipeline.sse_events) and are pushed row-by-row from the EXECUTORS
    through per-partition connections (``sink_factory() -> obj with
    .send(str)/.close()`` — an SSE response, a Kafka producer, a socket).

    Delivery contract (what the reference's per-user Flux guarantees):
    events repartition by ``userId`` and sort within partitions by
    ``(userId, rank, id, seq)``, so ONE connection carries each user's
    events, in relevance order, create→createLink→addMessage per hit.
    Different users interleave freely across connections, as in the
    reference.  ``processing_time`` (e.g. ``"1 second"``) keeps the query
    continuously polling; default drains the backlog and stops
    (AvailableNow) so tests are hermetic.
    """
    from .. import pipeline as P

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hits = batch_search(batch_df, chunks, k=k, dim=dim)
        # batch_search's kNN rank rides along for relevance-ordered delivery.
        events = P.sse_events(hits, user_col="user_id")

        def push(rows) -> None:
            sink = None
            try:
                for r in rows:
                    if sink is None:
                        sink = sink_factory()
                    sink.send(
                        f'{r["userId"]}\t{r["rank"]}\t{r["seq"]}\t{r["event_json"]}'
                    )
            finally:
                if sink is not None:
                    sink.close()

        (
            events.repartition("userId")
            .sortWithinPartitions("userId", "rank", "id", "seq")
            .foreachPartition(push)
        )

    writer = probes_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def serve_search_stream(
    probes_stream: DataFrame,
    chunks: DataFrame,
    output_dir: str,
    checkpoint: str,
    k: int = 5,
    dim: int = E.DEFAULT_DIM,
):
    """Start (and return) the streaming search query.

    ``probes_stream`` must have columns ``(user_id string, query_text
    string)``; results append to ``output_dir`` as parquet.  AvailableNow
    drains the backlog and stops; a production deployment would use a
    continuous trigger and an SSE/Kafka sink in place of parquet."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # Idempotent under micro-batch replay: results land in an epoch
        # partition and a re-run of the same epoch overwrites only that
        # partition instead of appending duplicates.
        (
            batch_search(batch_df, chunks, k=k, dim=dim)
            .withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(output_dir)
        )

    return (
        probes_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
