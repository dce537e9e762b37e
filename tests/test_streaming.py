"""Streaming: incremental binary ingest (checkpointed, AvailableNow) and
watermarked windowed aggregation with a batch-equivalence oracle."""

import os

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.sources import (
    binary as B,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
    ingest as SI,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
    windows as SW,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.tables import (
    load_table,
)


@pytest.fixture()
def doc_dir(tmp_path):
    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "a.pdf").write_bytes(B.make_fake_pdf(["page one text", "page two text"]))
    (d / "b.pdf").write_bytes(B.make_fake_pdf(["lonely page"]))
    (d / "ignore.txt").write_bytes(b"not a pdf")
    return str(d)


def test_batch_binary_ingest(spark, doc_dir):
    raw = B.read_binary_dir(spark, doc_dir, glob="*")
    assert raw.count() == 3  # glob loosened: all files visible
    pages = B.extract_pages(B.pdf_filter(raw))
    rows = {(r["fileName"], r["pageNumber"]): r["text"] for r in pages.collect()}
    assert rows[("a.pdf", 1)] == "page one text"
    assert rows[("a.pdf", 2)] == "page two text"
    assert rows[("b.pdf", 1)] == "lonely page"
    assert len(rows) == 3  # ignore.txt dropped by the suffix filter


def test_corrupt_file_yields_no_pages(spark, tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    (d / "corrupt.pdf").write_bytes(b"\x00\x01 garbage, not parseable")
    pages = B.extract_pages(B.read_binary_dir(spark, str(d), glob="*.pdf"))
    assert pages.count() == 0


def test_streaming_ingest_incremental(spark, doc_dir, tmp_path):
    chunks_out = str(tmp_path / "chunks")
    status_out = str(tmp_path / "status")
    ckpt = str(tmp_path / "ckpt")

    q = SI.ingest_stream(spark, doc_dir, chunks_out, status_out, ckpt)
    q.awaitTermination()
    first = spark.read.parquet(chunks_out)
    assert first.count() == 3  # 3 pages, 1 chunk each
    assert set(first.columns) == {
        "id", "embedding", "origntext", "fileName", "pageNumber",
    }

    # New file arrives; re-run drains ONLY the new file (checkpoint)
    with open(os.path.join(doc_dir, "c.pdf"), "wb") as f:
        f.write(B.make_fake_pdf(["late arrival"]))
    q2 = SI.ingest_stream(spark, doc_dir, chunks_out, status_out, ckpt)
    q2.awaitTermination()
    second = spark.read.parquet(chunks_out)
    assert second.count() == 4
    # the original files were NOT reprocessed (no duplicate ids)
    assert second.select("id").distinct().count() == 4

    status = spark.read.parquet(status_out)
    assert status.filter(F.col("status") == "COMPLETED").count() == 4


def test_stream_window_agg_matches_batch(spark, sf_dir):
    """Drive the streaming tumbling agg over the events fixture with
    AvailableNow and compare against the batch twin."""
    ev = load_table(spark, sf_dir, "events")
    # Streaming source: re-write a parquet copy with micros timestamps
    # (streaming reader hits the same nanos limitation as batch).
    src = "/tmp/events_stream_src"
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = SW.tumbling_counts(stream, window="10 minutes", watermark="1 minute")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    batch = SW.tumbling_counts.__wrapped__ if hasattr(SW.tumbling_counts, "__wrapped__") else None
    expect = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in (
            ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n",
                "total_value",
            )
        ).collect()
    }
    # Append-mode emits only windows closed by the final watermark; every
    # emitted window must match the batch result exactly, and the stream
    # must cover almost all of them (all but the last open windows).
    assert len(got) >= len(expect) - 10
    for k, v in got.items():
        assert expect[k][0] == v[0]
        assert expect[k][1] == pytest.approx(v[1])


def test_stateful_dedup_stream(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, "a"),
        (1, base + dt.timedelta(minutes=1), "a"),   # dup within watermark
        (2, base + dt.timedelta(minutes=2), "b"),
        (1, base + dt.timedelta(minutes=3), "a"),   # dup again
    ]
    src = str(tmp_path / "dedup_src")
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = SW.stateful_dedup(stream, ["k"], watermark="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT k FROM dedup_out").collect()
    assert sorted(r["k"] for r in got) == [1, 2]


def test_sessionize_batch_gap_split(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 100, base, 1.0),
        (2, 100, base + dt.timedelta(minutes=10), 1.0),
        (3, 100, base + dt.timedelta(minutes=50), 1.0),  # gap > 30min: new session
        (4, 200, base, 1.0),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    out = SW.sessionize_batch(ev, gap_seconds=1800)
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got[1] == 0 and got[2] == 0
    assert got[3] == 1
    assert got[4] == 0


def test_stateful_status_tracking_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState status fold across micro-batches == batch twin
    on the whole log; illegal transitions flagged, not silently accepted."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        state as ST,
    )

    happy = ["PAGE_SEPARATE_FINISHED", "FINISH_OAI_INVOCATION",
             "FINISH_DB_INSERTION", "COMPLETED"]
    retry = ["PAGE_SEPARATE_FINISHED", "RETRY_OAI_INVOCATION",
             "FINISH_OAI_INVOCATION", "FINISH_DB_INSERTION", "COMPLETED"]
    # Reference quirk we reject: COMPLETED directly after failure
    # (Function.java:175) -> valid must be False.
    quirk = ["PAGE_SEPARATE_FINISHED", "FINISH_OAI_INVOCATION",
             "FAILED_DB_INSERTION", "COMPLETED"]
    rows = []
    for cid, seqn in (("a", happy), ("b", retry), ("c", quirk)):
        rows += [(cid, s, i) for i, s in enumerate(seqn)]
    df = spark.createDataFrame(rows, "id string, status string, seq long")

    # Two files -> with maxFilesPerTrigger=1 AvailableNow runs 2 batches,
    # so per-id state genuinely persists across micro-batches.
    src = str(tmp_path / "status_src")
    df.filter(F.col("seq") < 2).coalesce(1).write.mode("overwrite").parquet(src)
    df.filter(F.col("seq") >= 2).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        ST.track_status_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("status_state_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.sql("SELECT * FROM status_state_out").collect()
    assert len(emitted) > 3, "expected per-batch update rows, got one batch"
    final = {}
    for r in emitted:  # last update per id = row with the highest n_events
        if r["id"] not in final or r["n_events"] > final[r["id"]]["n_events"]:
            final[r["id"]] = r
    got = {k: (v["status"], v["n_events"], v["valid"]) for k, v in final.items()}

    expect = {
        r["id"]: (r["status"], r["n_events"], r["valid"])
        for r in ST.track_status_batch(df).collect()
    }
    assert got == expect
    assert expect["a"] == ("COMPLETED", 4, True)
    assert expect["b"] == ("COMPLETED", 5, True)
    assert expect["c"] == ("COMPLETED", 4, False)


def test_fold_status_pure():
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming.state import (
        fold_status,
    )

    assert fold_status((None, 0, True), ["PAGE_SEPARATE_FINISHED"]) == (
        "PAGE_SEPARATE_FINISHED", 1, True,
    )
    # resuming from stored state continues the machine
    assert fold_status(("FINISH_DB_INSERTION", 3, True), ["COMPLETED"]) == (
        "COMPLETED", 4, True,
    )
    # out-of-order / illegal start
    assert fold_status((None, 0, True), ["COMPLETED"])[2] is False


def test_streaming_search_matches_batch_search(spark, sf_dir, tmp_path):
    """The serving path as a stream: two probe files -> two micro-batches;
    every probe's streamed top-5 equals the interactive P.search result."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (
        pipeline as P,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        serve as SV,
    )

    docs = load_table(spark, sf_dir, "documents").limit(200)
    chunks, _ = P.ingest_documents(docs)
    chunks = chunks.cache()

    probes = [("u1", "spark shuffle join vector search"),
              ("u2", "window merge batch table")]
    src = str(tmp_path / "probes")
    schema = "user_id string, query_text string"
    for i, row in enumerate(probes):
        spark.createDataFrame([row], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = str(tmp_path / "hits")
    q = SV.serve_search_stream(
        stream, chunks, output_dir=out,
        checkpoint=str(tmp_path / "ckpt"), k=5,
    )
    q.awaitTermination()

    got = spark.read.parquet(out)
    assert got.count() == 10  # 2 probes x k
    for user, text in probes:
        stream_ids = [
            r["id"]
            for r in got.filter(F.col("user_id") == user)
            .orderBy("rank")
            .collect()
        ]
        batch_ids = [
            r["id"] for r in P.search(chunks, text, k=5).collect()
        ]
        assert stream_ids == batch_ids, (user, text)
    chunks.unpersist()


def test_end_to_end_streaming_ingest_then_serve(spark, doc_dir, tmp_path):
    """The full reference lifecycle as two chained streaming jobs on disk
    artifacts: binary PDFs -> checkpointed ingest -> chunks parquet ->
    probe stream -> served top-k.  Mirrors SURVEY.md §3.1 + §3.2 composed."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (
        pipeline as P,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        serve as SV,
    )

    chunks_out = str(tmp_path / "chunks")
    status_out = str(tmp_path / "status")
    SI.ingest_stream(
        spark, doc_dir, chunks_out, status_out, str(tmp_path / "ckpt1")
    ).awaitTermination()
    chunks = spark.read.parquet(chunks_out)
    assert chunks.count() == 3

    probes_src = str(tmp_path / "probes")
    schema = "user_id string, query_text string"
    spark.createDataFrame(
        [("u1", "page one text")], schema
    ).coalesce(1).write.parquet(probes_src)
    SV.serve_search_stream(
        spark.readStream.schema(schema).parquet(probes_src),
        chunks,
        output_dir=str(tmp_path / "hits"),
        checkpoint=str(tmp_path / "ckpt2"),
        k=2,
    ).awaitTermination()

    hits = spark.read.parquet(str(tmp_path / "hits"))
    assert hits.count() == 2
    # Served ranking equals the interactive search over the same store.
    expect = [r["id"] for r in P.search(chunks, "page one text", k=2).collect()]
    got = [r["id"] for r in hits.orderBy("rank").collect()]
    assert got == expect


def test_batch_search_duplicate_probes_stay_separate(spark, sf_dir):
    """Two identical submissions (same user, same text) are distinct
    probes: each gets its own full top-k (the row-number probe-id fix)."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (
        pipeline as P,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        serve as SV,
    )

    docs = load_table(spark, sf_dir, "documents").limit(100)
    chunks, _ = P.ingest_documents(docs)
    probes = spark.createDataFrame(
        [("u1", "spark vector"), ("u1", "spark vector"), ("u2|x", "spark")],
        "user_id string, query_text string",
    )
    out = SV.batch_search(probes, chunks, k=3).collect()
    assert len(out) == 9  # 3 probes x k, duplicates included
    per_user = {}
    for r in out:
        per_user.setdefault((r["user_id"], r["query_text"]), []).append(r["id"])
    assert len(per_user[("u1", "spark vector")]) == 6  # both duplicates served
    # pipe character in user_id cannot merge or split probe identities
    assert len(per_user[("u2|x", "spark")]) == 3


def test_batch_search_has_no_single_partition_exchange(spark, sf_dir):
    """The probe-id scheme must not serialize a large offline probe table
    through a global window (VERDICT r01): no Exchange SinglePartition in
    the batch_search plan."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (
        pipeline as P,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        serve as SV,
    )

    docs = load_table(spark, sf_dir, "documents")
    chunks, _ = P.ingest_documents(docs)
    probes = spark.range(64).select(
        F.concat(F.lit("u"), F.col("id")).alias("user_id"),
        F.concat(F.lit("query "), F.col("id")).alias("query_text"),
    ).repartition(8)
    plan = (
        SV.batch_search(probes, chunks, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan, plan


def test_real_pdf_ingest_end_to_end(spark, tmp_path):
    """A REAL multi-page PDF (valid xref, Flate-compressed content streams,
    built by sources/minipdf.make_pdf) through the full pipeline:
    binaryFile scan -> per-page extraction -> normalize/chunk -> embed ->
    searchable vector table (reference Function.java:90-132 with PDFBox;
    here the bundled pure-stdlib simple-PDF parser)."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (
        pipeline as P,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.sources import (
        minipdf as MP,
    )

    d = tmp_path / "realpdfs"
    d.mkdir()
    pdf = MP.make_pdf(
        [
            "Spark is a distributed engine. It shuffles; it broadcasts!",
            "Vector search over embeddings. Parentheses (like these) and a \\ survive.",
        ]
    )
    (d / "real.pdf").write_bytes(pdf)
    assert pdf.startswith(b"%PDF-")  # a real PDF file, not the test format

    raw = B.read_binary_dir(spark, str(d), glob="*.pdf")
    pages = B.extract_pages(B.pdf_filter(raw))
    rows = {r["pageNumber"]: r["text"] for r in pages.collect()}
    assert rows[1] == "Spark is a distributed engine. It shuffles; it broadcasts!"
    assert (
        rows[2]
        == "Vector search over embeddings. Parentheses (like these) and a \\ survive."
    )

    chunks, status = P.ingest_documents(
        pages, text_col="text", file_col="fileName", page_col="pageNumber"
    )
    got = chunks.orderBy("pageNumber").collect()
    assert [r["pageNumber"] for r in got] == [1, 2]
    assert all(len(r["embedding"]) == 64 for r in got)
    hits = P.search(chunks, "vector search embeddings", k=1).collect()
    assert len(hits) == 1 and hits[0]["fileName"] == "real.pdf"


def test_serve_push_stream_per_user_ordered_delivery(spark, sf_dir, tmp_path):
    """The continuous push sink (SSE emitter analog,
    SSEOpenAIController.java:96-133): executors push event rows over
    per-partition connections; each user's events arrive on ONE connection,
    in relevance (rank) then seq order, create->createLink->addMessage per
    hit."""
    import json
    import socket
    import socketserver
    import threading

    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (
        pipeline as P,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        serve as SV,
    )

    # Line-collecting TCP server: one list per connection.
    conns: list[list[str]] = []
    lock = threading.Lock()

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            mine: list[str] = []
            with lock:
                conns.append(mine)
            for line in self.rfile:
                mine.append(line.decode("utf-8").rstrip("\n"))

    server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    class SocketSink:
        def __init__(self):
            self.sock = socket.create_connection(("127.0.0.1", port))

        def send(self, line: str) -> None:
            self.sock.sendall(line.encode("utf-8") + b"\n")

        def close(self) -> None:
            self.sock.close()

    docs = load_table(spark, sf_dir, "documents")
    chunks, _ = P.ingest_documents(docs)

    probes_src = str(tmp_path / "probes_src")
    spark.createDataFrame(
        [("alice", "spark vector search"), ("bob", "join shuffle"),
         ("carol", "embedding distance")],
        "user_id string, query_text string",
    ).write.parquet(probes_src)
    probes_stream = spark.readStream.schema(
        "user_id string, query_text string"
    ).parquet(probes_src)

    q = SV.serve_push_stream(
        probes_stream, chunks, SocketSink,
        checkpoint=str(tmp_path / "ckpt_push"), k=3,
    )
    q.awaitTermination()
    server.shutdown()

    by_user: dict[str, list[tuple[int, int, str]]] = {}
    user_conns: dict[str, set[int]] = {}
    for ci, lines in enumerate(conns):
        for line in lines:
            user, rank, seq, ev = line.split("\t", 3)
            by_user.setdefault(user, []).append((int(rank), int(seq), ev))
            user_conns.setdefault(user, set()).add(ci)

    assert set(by_user) == {"alice", "bob", "carol"}
    for user, events in by_user.items():
        # one connection per user (repartition by userId)
        assert len(user_conns[user]) == 1, user
        # 3 hits x 3 events, delivered already in (rank, seq) order
        assert len(events) == 9, user
        assert events == sorted(events, key=lambda e: (e[0], e[1])), user
        for rank in (1, 2, 3):
            types = [json.loads(e[2])["type"] for e in events if e[0] == rank]
            assert types == ["create", "createLink", "addMessage"], (user, rank)


def test_neardup_detect_and_register_batches(spark, tmp_path):
    """Incremental near-dup detection: batch 2's near-copy of a batch-1 doc
    is flagged on arrival against the persisted band store; within-batch
    duplicates are flagged once with the smaller id as the match; unrelated
    docs never match.  The pair set equals the batch operator's answer on
    the union corpus (same banding + verification)."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        neardup as ND,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
        dedup as D,
    )

    band_d = str(tmp_path / "bands")
    sh_d = str(tmp_path / "shingles")
    m_d = str(tmp_path / "matches")

    base = (
        "the quick brown fox jumps over the lazy dog while a cat "
        "watches from the windowsill in the warm afternoon sun today"
    )
    b1 = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),  # near-dup of 1, same batch
            (3, "completely different text about spark shuffles and parquet files"),
        ],
        "doc_id long, text string",
    )
    ND.detect_and_register(b1, band_d, sh_d, m_d)
    m1 = {
        (r["new_id"], r["matched_id"])
        for r in spark.read.parquet(m_d).collect()
    }
    assert m1 == {(2, 1)}

    b2 = spark.createDataFrame(
        [
            (10, base + " indeed"),  # near-dup of 1 (J≈0.95) and 2 (J=0.9)
            (11, "yet another unrelated document mentioning catalyst and codegen"),
        ],
        "doc_id long, text string",
    )
    ND.detect_and_register(b2, band_d, sh_d, m_d)
    m2 = {
        (r["new_id"], r["matched_id"])
        for r in spark.read.parquet(m_d).collect()
    }
    assert (10, 1) in m2 and (10, 2) in m2
    assert all(new != 11 for new, _ in m2)

    # Equivalence with the batch operator over the union corpus: the
    # incremental match set is exactly the batch pair set (directions
    # normalized — incremental emits (later, earlier)).
    batch_pairs = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]))
        for r in D.minhash_lsh_pairs(
            b1.unionByName(b2), "text", "doc_id", threshold=0.8
        ).collect()
    }
    assert m2 == batch_pairs


def test_neardup_stream_restarts_with_store(spark, tmp_path):
    """The streaming wrapper drains with AvailableNow, and a SECOND run
    with the same checkpoint processes only the newly arrived file while
    matching against the first run's band store."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        neardup as ND,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    band_d = str(tmp_path / "bands")
    sh_d = str(tmp_path / "shingles")
    m_d = str(tmp_path / "matches")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    base = (
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen"
    )
    spark.createDataFrame([(1, base)], schema).write.mode("append").parquet(
        src
    )
    q = ND.neardup_stream(spark, src, schema, band_d, sh_d, m_d, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(m_d).count() == 0

    spark.createDataFrame(
        [(2, base + " seventeen")], schema
    ).write.mode("append").parquet(src)
    q = ND.neardup_stream(spark, src, schema, band_d, sh_d, m_d, ckpt)
    q.awaitTermination()
    rows = spark.read.parquet(m_d).collect()
    assert {(r["new_id"], r["matched_id"]) for r in rows} == {(2, 1)}


def test_neardup_stream_inline_compaction(spark, tmp_path):
    """``neardup_stream(compact_every=2)``: the band store folds from
    inside foreachBatch and later batches still match via it — matches
    equal the non-compacting twin, band store stays distinct, committed
    epoch dirs consolidate."""
    import glob

    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        neardup as ND,
    )

    schema = "doc_id long, text string"
    base = (
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen"
    )
    files = [
        [(1, base)],
        [(2, "totally unrelated words about parquet files and buckets")],
        [(3, "fresh vocabulary in the third arrival nothing shared")],
        [(4, base + " seventeen")],  # matches 1 via the (folded) store
    ]

    def run(root, compact_every=None):
        src = str(root / "src")
        os.makedirs(src)
        for rows in files:
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        ND.neardup_stream(
            spark, src, schema, str(root / "b"), str(root / "sh"),
            str(root / "m"), str(root / "ckpt"),
            max_files_per_trigger=1, compact_every=compact_every,
        ).awaitTermination()
        return sorted(
            (r["new_id"], r["matched_id"])
            for r in spark.read.parquet(str(root / "m")).collect()
        )

    plain_root, comp_root = tmp_path / "plain", tmp_path / "comp"
    os.makedirs(plain_root)
    os.makedirs(comp_root)
    want = run(plain_root)
    got = run(comp_root, compact_every=2)
    assert got == want == [(4, 1)]
    b = spark.read.parquet(str(comp_root / "b"))
    assert b.count() == b.dropDuplicates(["band", "key", "id"]).count()
    assert len(glob.glob(str(comp_root / "b" / "epoch=*"))) < len(
        glob.glob(str(plain_root / "b" / "epoch=*"))
    )


def test_neardup_detect_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running the same epoch of the
    incremental near-dup pass must rewrite its own output, never append
    duplicate matches or band/shingle registrations."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        neardup as ND,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun"
    )
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, "entirely different text about parquet")],
        "doc_id long, text string",
    )
    band_d = str(tmp_path / "bands")
    sh_d = str(tmp_path / "shingles")
    m_d = str(tmp_path / "matches")
    ND.detect_and_register(docs, band_d, sh_d, m_d, epoch_id=0)
    once = sorted(
        (r["new_id"], r["matched_id"])
        for r in spark.read.parquet(m_d).collect()
    )
    n_bands = spark.read.parquet(band_d).count()
    assert once == [(2, 1)]
    # replay (crash-after-write restart)
    ND.detect_and_register(docs, band_d, sh_d, m_d, epoch_id=0)
    again = sorted(
        (r["new_id"], r["matched_id"])
        for r in spark.read.parquet(m_d).collect()
    )
    assert again == once
    assert spark.read.parquet(band_d).count() == n_bands
    # a later epoch still matches against epoch 0's registrations
    more = spark.createDataFrame([(9, base)], "doc_id long, text string")
    ND.detect_and_register(more, band_d, sh_d, m_d, epoch_id=1)
    final = sorted(
        (r["new_id"], r["matched_id"])
        for r in spark.read.parquet(m_d).collect()
    )
    assert final == [(2, 1), (9, 1), (9, 2)]


class TestStreamingSubstring:
    def test_single_batch_equals_batch_operator(self, spark, sf_dir, tmp_path):
        """One batch over the whole corpus == dedup.ngram_dup_stats
        (same window universe, df>=2 rule, and column contract)."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
            dedup as D,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.tables import (
            load_table,
        )

        docs = load_table(spark, sf_dir, "documents")
        gram_d, stats_d = str(tmp_path / "grams"), str(tmp_path / "stats")
        SB.detect_and_register(docs, gram_d, stats_d, n=8)
        got = sorted(
            map(tuple, spark.read.parquet(stats_d).collect())
        )
        want = sorted(map(tuple, D.ngram_dup_stats(docs, n=8).collect()))
        assert got == want

    def test_incremental_flags_cross_batch_grams(self, spark, tmp_path):
        """A later doc repeating an accepted doc's 8-gram is flagged via
        the gram STORE even though its own batch has no internal dups."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        span = "one two three four five six seven eight"
        b1 = spark.createDataFrame(
            [(1, f"{span} tail-a"), (2, "all unique words in this early doc")],
            "doc_id long, text string",
        )
        b2 = spark.createDataFrame(
            [(3, f"prefix {span} suffix"), (4, "another fully unique doc")],
            "doc_id long, text string",
        )
        gram_d, stats_d = str(tmp_path / "g"), str(tmp_path / "s")
        SB.detect_and_register(b1, gram_d, stats_d, n=8, epoch_id=0)
        SB.detect_and_register(b2, gram_d, stats_d, n=8, epoch_id=1)
        got = {
            r["doc_id"]: r for r in spark.read.parquet(stats_d).collect()
        }
        assert got[1]["n_dup_grams"] == 0  # first carrier saw nothing prior
        assert got[3]["n_dup_grams"] == 1  # flagged against the store
        assert got[2]["n_dup_grams"] == 0 and got[4]["n_dup_grams"] == 0

    def test_replay_is_idempotent(self, spark, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        docs = spark.createDataFrame(
            [(1, "a b c d e f g h i"), (2, "a b c d e f g h j")],
            "doc_id long, text string",
        )
        gram_d, stats_d = str(tmp_path / "g"), str(tmp_path / "s")
        SB.detect_and_register(docs, gram_d, stats_d, n=8, epoch_id=0)
        once = sorted(map(tuple, spark.read.parquet(stats_d).collect()))
        n_grams_once = spark.read.parquet(gram_d).count()
        SB.detect_and_register(docs, gram_d, stats_d, n=8, epoch_id=0)
        assert sorted(map(tuple, spark.read.parquet(stats_d).collect())) == once
        assert spark.read.parquet(gram_d).count() == n_grams_once

    def test_all_short_first_batch_does_not_poison_store(self, spark, tmp_path):
        """A first batch where every doc has < n tokens registers nothing;
        the empty partitioned write must be SKIPPED (a file-less epoch dir
        would make every later store read fail schema inference), and the
        next batch must work normally."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        shorts = spark.createDataFrame(
            [(1, "too short"), (2, "also tiny")], "doc_id long, text string"
        )
        gram_d, s_d = str(tmp_path / "g"), str(tmp_path / "s")
        SB.detect_and_register(shorts, gram_d, s_d, n=8, epoch_id=0)
        real = spark.createDataFrame(
            [(3, "a b c d e f g h i"), (4, "a b c d e f g h j")],
            "doc_id long, text string",
        )
        SB.detect_and_register(real, gram_d, s_d, n=8, epoch_id=1)
        got = {
            r["doc_id"]: r["n_dup_grams"]
            for r in spark.read.parquet(s_d).collect()
        }
        assert got[1] == 0 and got[2] == 0
        assert got[3] >= 1 and got[4] >= 1  # shared "a b c d e f g h"


def test_substring_stream_kill_resume_exactly_once(spark, tmp_path):
    """Kill a real substring_stream mid-ingest — AFTER a batch's state
    writes but BEFORE its checkpoint commit (the at-least-once window) —
    then resume from the checkpoint (VERDICT r03 #5).  The resumed run
    must replay the killed epoch idempotently and drain the rest; the
    final per-doc stats must be EXACTLY the uninterrupted single-batch
    result: every doc exactly once, equal to the batch operator's answer
    over the same arrival order."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        substring as SB,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "doc_id long, text string"
    span = "alpha beta gamma delta epsilon zeta eta theta"
    # Four files -> four micro-batches (maxFilesPerTrigger=1).  Cross-file
    # duplication: docs 30 and 40 repeat file 1's span, so their flags
    # depend on the gram STORE surviving the crash.
    files = [
        [(10, f"{span} one"), (11, "totally unique words here only")],
        [(20, "all fresh vocabulary nothing shared at all")],
        [(30, f"prefix {span} suffix")],
        [(40, f"{span} again repeated")],
    ]
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    gram_d = str(tmp_path / "grams")
    stats_d = str(tmp_path / "stats")
    ckpt = str(tmp_path / "ckpt")

    # Run 1: crash after epoch 1's writes (state written, commit lost).
    def crash_on_1(epoch_id: int) -> None:
        if epoch_id == 1:
            raise RuntimeError("injected crash after epoch-1 writes")

    q = SB.substring_stream(
        spark, src, schema, gram_d, stats_d, ckpt,
        max_files_per_trigger=1, on_batch=crash_on_1,
    )
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination()
    # the crash landed mid-ingest: some but not all docs processed
    done = {r["doc_id"] for r in spark.read.parquet(stats_d).collect()}
    assert {10, 11} <= done and 40 not in done

    # Run 2: resume from the same checkpoint — replays epoch 1, drains.
    q = SB.substring_stream(
        spark, src, schema, gram_d, stats_d, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination()

    got = spark.read.parquet(stats_d).collect()
    by_doc = {}
    for r in got:
        assert r["doc_id"] not in by_doc, f"doc {r['doc_id']} duplicated"
        by_doc[r["doc_id"]] = r
    assert set(by_doc) == {10, 11, 20, 30, 40}
    # store-dependent flags are correct across the crash: 30 and 40 carry
    # file-1's 8-gram, 40 also matches 30's registration of it.
    assert by_doc[10]["n_dup_grams"] == 0
    assert by_doc[30]["n_dup_grams"] == 1
    assert by_doc[40]["n_dup_grams"] == 1
    # gram store stayed distinct (no replay double-registration): every
    # gk appears exactly once across all epochs.
    grams = spark.read.parquet(gram_d)
    assert grams.count() == grams.select("gk").distinct().count()


def test_compact_store_preserves_content_and_replay_safety(spark, tmp_path):
    """Maintenance compaction (streaming/stores.compact_store): folds all
    committed epoch dirs into one consolidated epoch = max-1 directory —
    same distinct grams, fewer files — while the NEWEST epoch stays
    untouched so a crash-replay of it (which prepare_store drops from
    the candidate store) cannot drop the folded history."""
    import glob

    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        stores as ST,
        substring as SB,
    )

    gram_d, stats_d = str(tmp_path / "g"), str(tmp_path / "s")
    span = "alpha beta gamma delta epsilon zeta eta theta"
    batches = [
        [(1, f"{span} one"), (2, "unique words for the second doc")],
        [(3, "wholly different vocabulary words span batch two here now")],
        [(4, "third batch text with fully fresh terms appearing only here")],
        [(5, "fourth batch also uses novel words entirely of its own kind")],
    ]
    for e, rows in enumerate(batches):
        SB.detect_and_register(
            spark.createDataFrame(rows, "doc_id long, text string"),
            gram_d, stats_d, n=8, epoch_id=e,
        )
    before = {
        (r["gk"], r["bucket"])
        for r in spark.read.parquet(gram_d).collect()
    }
    files_before = len(glob.glob(f"{gram_d}/epoch=*/bucket=*/*.parquet"))

    out = ST.compact_store(spark, gram_d, "bucket", sort_cols=["gk"])
    assert out["compacted"] and out["epochs_folded"] == 3
    assert out["target_epoch"] == 2

    after_df = spark.read.parquet(gram_d)
    after = {(r["gk"], r["bucket"]) for r in after_df.collect()}
    assert after == before  # content identical
    assert set(
        r[0] for r in after_df.select("epoch").distinct().collect()
    ) == {2, 3}  # folded history + untouched newest
    # The lever is directory/epoch consolidation: 4 epoch dirs -> 2, and
    # at most one file per (epoch, bucket) in the folded dir.  (Total
    # file count only shrinks when epochs share buckets — this fixture
    # is too small to guarantee overlap, so assert the structure.)
    assert len(glob.glob(f"{gram_d}/epoch=*")) == 2
    assert all(
        len(glob.glob(f"{d}/*.parquet")) == 1
        for d in glob.glob(f"{gram_d}/epoch=2/bucket=*")
    )
    files_after = len(glob.glob(f"{gram_d}/epoch=*/bucket=*/*.parquet"))
    assert files_after <= files_before

    # replay of the NEWEST epoch (crash-after-write) is still safe and
    # idempotent against the compacted store...
    SB.detect_and_register(
        spark.createDataFrame(batches[3], "doc_id long, text string"),
        gram_d, stats_d, n=8, epoch_id=3,
    )
    assert {
        (r["gk"], r["bucket"]) for r in spark.read.parquet(gram_d).collect()
    } == before
    # ...and the next epoch still flags against the full folded history.
    SB.detect_and_register(
        spark.createDataFrame(
            [(9, f"prefix {span} suffix")], "doc_id long, text string"
        ),
        gram_d, stats_d, n=8, epoch_id=4,
    )
    got = {r["doc_id"]: r["n_dup_grams"]
           for r in spark.read.parquet(stats_d).collect()}
    assert got[9] == 1  # epoch-0 gram found via the compacted dir


def test_substring_stream_inline_compaction(spark, tmp_path):
    """``substring_stream(compact_every=2)`` folds the gram store from
    inside foreachBatch.  Stats must equal the non-compacting twin over
    the same arrivals, the store must end consolidated, and a crash
    injected right AFTER a compacting epoch (state written + folded,
    checkpoint commit lost) must replay exactly-once — the
    register -> compact -> commit sequence is idempotent end to end."""
    import glob

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        substring as SB,
    )

    schema = "doc_id long, text string"
    span = "alpha beta gamma delta epsilon zeta eta theta"
    files = [
        [(10, f"{span} one"), (11, "totally unique words here only")],
        [(20, "all fresh vocabulary nothing shared at all")],
        [(30, f"prefix {span} suffix")],
        [(40, f"{span} again repeated")],
        [(50, "closing batch of wholly new words never seen before now")],
    ]

    def run(root, on_batch=None, compact_every=None, resume=False):
        src = str(root / "src")
        if not resume:
            os.makedirs(src)
            for rows in files:
                spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                    "append"
                ).parquet(src)
        q = SB.substring_stream(
            spark, src, schema, str(root / "g"), str(root / "s"),
            str(root / "ckpt"), max_files_per_trigger=1,
            on_batch=on_batch, compact_every=compact_every,
        )
        return q

    # Twin A: plain run.
    plain = tmp_path / "plain"
    os.makedirs(plain)
    run(plain).awaitTermination()
    want = sorted(
        map(tuple, spark.read.parquet(str(plain / "s")).collect())
    )

    # Twin B: compacting run with a crash after epoch 2 (a compacting
    # epoch: 2 % 2 == 0, so the fold ran before the injected death).
    comp = tmp_path / "comp"
    os.makedirs(comp)

    def crash_on_2(epoch_id: int) -> None:
        if epoch_id == 2:
            raise RuntimeError("injected crash after epoch-2 compaction")

    q = run(comp, on_batch=crash_on_2, compact_every=2)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination()
    run(comp, compact_every=2, resume=True).awaitTermination()

    got = sorted(map(tuple, spark.read.parquet(str(comp / "s")).collect()))
    assert got == want
    # store content identical to the plain twin, no replay duplicates
    g_plain = {
        (r["gk"], r["bucket"])
        for r in spark.read.parquet(str(plain / "g")).collect()
    }
    g_comp_df = spark.read.parquet(str(comp / "g"))
    assert {(r["gk"], r["bucket"]) for r in g_comp_df.collect()} == g_plain
    assert g_comp_df.count() == g_comp_df.select("gk").distinct().count()
    # compaction actually consolidated: committed history sits in at most
    # one folded dir + the epochs after the last fold (4 on resume).
    assert len(glob.glob(str(comp / "g" / "epoch=*"))) < len(
        glob.glob(str(plain / "g" / "epoch=*"))
    )


def test_compact_store_recovers_interrupted_swap(spark, tmp_path):
    """A process death INSIDE compact_store's swap must never lose
    membership rows (ADVICE r6, medium): the target epoch dir is renamed
    aside rather than deleted, and entry-time recovery repairs each of
    the three interruptible states BEFORE the store is re-read, so the
    rebuilt temp dir can never be derived from a store missing the
    target epoch."""
    import glob
    import os
    import shutil

    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        stores as ST,
        substring as SB,
    )

    gram_d, stats_d = str(tmp_path / "g"), str(tmp_path / "s")
    batches = [
        [(1, "alpha beta gamma delta epsilon zeta eta theta one")],
        [(2, "unique words for the second doc here now today ok")],
        [(3, "third batch text with fully fresh terms appearing only")],
        [(4, "fourth batch also uses novel words entirely of its own")],
    ]
    for e, rows in enumerate(batches):
        SB.detect_and_register(
            spark.createDataFrame(rows, "doc_id long, text string"),
            gram_d, stats_d, n=8, epoch_id=e,
        )
    before = {
        (r["gk"], r["bucket"])
        for r in spark.read.parquet(gram_d).collect()
    }

    # State 1 — died after writing the temp dir, before the aside
    # rename: store untouched, stale temp must be dropped (NOT trusted).
    os.makedirs(gram_d + ".compact_tmp/bucket=0", exist_ok=True)
    out = ST.compact_store(spark, gram_d, "bucket", sort_cols=["gk"])
    assert out["compacted"] and out["target_epoch"] == 2
    assert not os.path.exists(gram_d + ".compact_tmp")
    assert {(r["gk"], r["bucket"])
            for r in spark.read.parquet(gram_d).collect()} == before

    # State 3 — died after the rename-in: folded dir live, aside is a
    # duplicate subset.  Recovery drops the aside, content unchanged.
    some_bucket = glob.glob(f"{gram_d}/epoch=2/bucket=*")[0]
    aside = gram_d + ".compact_old_epoch=2"
    shutil.copytree(some_bucket, f"{aside}/{os.path.basename(some_bucket)}")
    SB.detect_and_register(  # new epoch so there is history to fold
        spark.createDataFrame(
            [(5, "fifth batch brings more novel words of its very own")],
            "doc_id long, text string",
        ),
        gram_d, stats_d, n=8, epoch_id=4,
    )
    before = {
        (r["gk"], r["bucket"])
        for r in spark.read.parquet(gram_d).collect()
    }
    out = ST.compact_store(spark, gram_d, "bucket", sort_cols=["gk"])
    assert out["compacted"]
    assert not os.path.exists(aside)
    assert {(r["gk"], r["bucket"])
            for r in spark.read.parquet(gram_d).collect()} == before

    # State 2 — died between the aside rename and the rename-in: the
    # live tree is MISSING the target epoch; the only copies are the
    # aside dir and the temp dir.  This is exactly the pre-fix data-loss
    # window: without recovery, the next compaction rebuilds the temp
    # dir from the incomplete store with mode("overwrite"), destroying
    # both surviving copies.  Recovery must restore the aside first.
    target = sorted(
        int(d.rsplit("=", 1)[1]) for d in glob.glob(f"{gram_d}/epoch=*")
    )[-2]
    os.rename(f"{gram_d}/epoch={target}",
              gram_d + f".compact_old_epoch={target}")
    os.makedirs(gram_d + ".compact_tmp/bucket=0", exist_ok=True)
    assert {(r["gk"], r["bucket"])  # live tree really is incomplete now
            for r in spark.read.parquet(gram_d).collect()} != before
    out = ST.compact_store(spark, gram_d, "bucket", sort_cols=["gk"])
    assert out["compacted"]
    assert not os.path.exists(gram_d + f".compact_old_epoch={target}")
    assert not os.path.exists(gram_d + ".compact_tmp")
    assert {(r["gk"], r["bucket"])
            for r in spark.read.parquet(gram_d).collect()} == before


def test_compact_store_single_epoch_noop_and_flat_raises(spark, tmp_path):
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        stores as ST,
        substring as SB,
    )

    gram_d, stats_d = str(tmp_path / "g1"), str(tmp_path / "s1")
    SB.detect_and_register(
        spark.createDataFrame(
            [(1, "a b c d e f g h i")], "doc_id long, text string"
        ),
        gram_d, stats_d, n=8, epoch_id=0,
    )
    assert ST.compact_store(spark, gram_d, "bucket") == {
        "compacted": False, "reason": "single epoch",
    }
    assert ST.compact_store(spark, str(tmp_path / "nope"), "bucket") == {
        "compacted": False, "reason": "store missing",
    }

    flat_d, fs_d = str(tmp_path / "gf"), str(tmp_path / "sf")
    SB.detect_and_register(
        spark.createDataFrame(
            [(1, "a b c d e f g h i")], "doc_id long, text string"
        ),
        flat_d, fs_d, n=8,  # no epoch -> flat layout
    )
    import pytest

    with pytest.raises(ValueError, match="flat"):
        ST.compact_store(spark, flat_d, "bucket")


class TestKeyedSubstring:
    def test_single_batch_equals_batch_operator(self, spark, sf_dir, tmp_path):
        """One availableNow drain over the corpus == ngram_dup_stats
        (same window universe, df>=2 rule, column contract) — the keyed
        state store changes the probe mechanics, never the answer."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
            dedup as D,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.tables import (
            load_table,
        )

        docs = load_table(spark, sf_dir, "documents")
        src = str(tmp_path / "src")
        docs.select("doc_id", "text").write.parquet(src)
        stats_d, ckpt = str(tmp_path / "stats"), str(tmp_path / "ckpt")
        q = SB.keyed_substring_stream(
            spark, src, "doc_id long, text string", stats_d, ckpt, n=8
        )
        q.awaitTermination()
        got = sorted(map(tuple, spark.read.parquet(stats_d).drop("epoch").collect()))
        want = sorted(map(tuple, D.ngram_dup_stats(docs, n=8).collect()))
        assert got == want

    def test_cross_batch_flags_via_keyed_state(self, spark, tmp_path):
        """A later batch repeating an accepted doc's 8-gram is flagged
        from the CHECKPOINTED keyed state across a stream restart."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        schema = "doc_id long, text string"
        span = "one two three four five six seven eight"
        stats_d, ckpt = str(tmp_path / "stats"), str(tmp_path / "ckpt")

        spark.createDataFrame(
            [(1, f"{span} tail-a"), (2, "short")], schema
        ).write.mode("append").parquet(src)
        q = SB.keyed_substring_stream(spark, src, schema, stats_d, ckpt, n=8)
        q.awaitTermination()

        spark.createDataFrame(
            [(3, f"prefix {span} suffix"), (4, "also tiny")], schema
        ).write.mode("append").parquet(src)
        q = SB.keyed_substring_stream(spark, src, schema, stats_d, ckpt, n=8)
        q.awaitTermination()

        got = {
            r["doc_id"]: r for r in spark.read.parquet(stats_d).collect()
        }
        assert set(got) == {1, 2, 3, 4}
        assert got[1]["n_dup_grams"] == 0   # first carrier saw nothing
        assert got[3]["n_dup_grams"] == 1   # flagged via keyed state
        # zero-gram docs pass through the NULL-key sentinel with zeros
        assert got[2]["n_grams"] == 0 and got[2]["n_dup_grams"] == 0
        assert got[4]["dup_gram_ppm"] == 0


def test_compact_store_on_band_and_vector_stores(spark, tmp_path):
    """compact_store is layout-generic: the MinHash band store (partition
    col `band`) and the semantic vector store (`cluster_id`) fold the
    same way the gram store does, and the next incremental batch still
    matches against the folded history."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        neardup as ND,
        semdedup as SS,
        stores as ST,
    )

    # --- band store ------------------------------------------------------
    base = (
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen"
    )
    band_d, sh_d, m_d = (
        str(tmp_path / "bands"), str(tmp_path / "sh"), str(tmp_path / "m")
    )
    for e, rows in enumerate(
        [[(1, base)], [(2, "wholly different text in the second epoch here")]]
    ):
        ND.detect_and_register(
            spark.createDataFrame(rows, "doc_id long, text string"),
            band_d, sh_d, m_d, epoch_id=e,
        )
    before = {
        tuple(r) for r in spark.read.parquet(band_d).drop("epoch").collect()
    }
    out = ST.compact_store(spark, band_d, "band")
    assert out["compacted"] and out["epochs_folded"] == 1
    assert {
        tuple(r) for r in spark.read.parquet(band_d).drop("epoch").collect()
    } == before
    ND.detect_and_register(
        spark.createDataFrame(
            [(9, base + " seventeen")], "doc_id long, text string"
        ),
        band_d, sh_d, m_d, epoch_id=2,
    )
    got = {
        (r["new_id"], r["matched_id"])
        for r in spark.read.parquet(m_d).collect()
    }
    assert (9, 1) in got  # matched via the folded band history

    # --- semantic vector store ------------------------------------------
    cents = [[1.0, 0.0], [0.0, 1.0]]
    store, matches = str(tmp_path / "vs"), str(tmp_path / "vm")
    for e, rows in enumerate(
        [[(10, [1.0, 0.01])], [(11, [0.01, 1.0])]]
    ):
        SS.detect_and_register(
            spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
            cents, store, matches, eps=0.05, epoch_id=e,
        )
    out = ST.compact_store(spark, store, "cluster_id")
    assert out["compacted"] and out["epochs_folded"] == 1
    SS.detect_and_register(
        spark.createDataFrame(
            [(12, [0.99, 0.02])], "vec_id long, embedding array<float>"
        ),
        cents, store, matches, eps=0.05, epoch_id=2,
    )
    got = {
        (r["new_id"], r["matched_id"])
        for r in spark.read.parquet(matches).collect()
    }
    assert (12, 10) in got  # matched via the folded vector history


def test_keyed_substring_stream_kill_resume_exactly_once(spark, tmp_path):
    """Kill the KEYED stream after a batch's stats write but before its
    checkpoint commit: on resume the state store restores the pre-batch
    version (state updates commit WITH the epoch), the killed epoch
    replays against identical state, and the epoch-keyed stats overwrite
    makes the output exactly-once — the 'replay idempotence from state
    versioning' claim, proven rather than asserted."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        substring as SB,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "doc_id long, text string"
    span = "alpha beta gamma delta epsilon zeta eta theta"
    files = [
        [(10, f"{span} one")],
        [(20, f"prefix {span} suffix")],     # dup via keyed state
        [(30, f"{span} once more")],         # dup via keyed state
    ]
    for rows in files:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stats_d, ckpt = str(tmp_path / "stats"), str(tmp_path / "ckpt")

    def crash_on_1(epoch_id: int) -> None:
        if epoch_id == 1:
            raise RuntimeError("injected crash after epoch-1 stats write")

    q = SB.keyed_substring_stream(
        spark, src, schema, stats_d, ckpt,
        n=8, max_files_per_trigger=1, on_batch=crash_on_1,
    )
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination()
    partial = {r["doc_id"] for r in spark.read.parquet(stats_d).collect()}
    assert 10 in partial and 30 not in partial

    q = SB.keyed_substring_stream(
        spark, src, schema, stats_d, ckpt, n=8, max_files_per_trigger=1
    )
    q.awaitTermination()
    got = spark.read.parquet(stats_d).collect()
    by_doc = {}
    for r in got:
        assert r["doc_id"] not in by_doc, f"doc {r['doc_id']} duplicated"
        by_doc[r["doc_id"]] = r
    assert set(by_doc) == {10, 20, 30}
    assert by_doc[10]["n_dup_grams"] == 0
    # the replayed epoch saw the RESTORED state (gram not double-marked),
    # and later epochs see the state including the replayed epoch
    assert by_doc[20]["n_dup_grams"] == 1
    assert by_doc[30]["n_dup_grams"] == 1


class TestTieredSubstring:
    """The LSM-tiered stream (streaming/substring.tiered_substring_stream):
    committed parquet history probed JVM-side + session-bounded keyed
    delta state."""

    def test_single_batch_equals_batch_operator(self, spark, sf_dir, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
            dedup as D,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        docs = load_table(spark, sf_dir, "documents")
        src = str(tmp_path / "src")
        docs.select("doc_id", "text").write.parquet(src)
        gram_d = str(tmp_path / "grams")
        stats_d, ckpt = str(tmp_path / "stats"), str(tmp_path / "ckpt")
        q = SB.tiered_substring_stream(
            spark, src, "doc_id long, text string", gram_d, stats_d, ckpt, n=8
        )
        q.awaitTermination()
        got = sorted(
            map(tuple, spark.read.parquet(stats_d).drop("epoch").collect())
        )
        want = sorted(map(tuple, D.ngram_dup_stats(docs, n=8).collect()))
        assert got == want

    def test_cross_session_flags_via_history_and_state_purge(
        self, spark, tmp_path
    ):
        """Session 2 flags a session-1 gram via the HISTORY snapshot (the
        keyed state from session 1 was purged by the marker advance), and
        the gram store stays one-row-per-distinct-gram."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        schema = "doc_id long, text string"
        span = "one two three four five six seven eight"
        gram_d = str(tmp_path / "grams")
        stats_d, ckpt = str(tmp_path / "stats"), str(tmp_path / "ckpt")

        spark.createDataFrame(
            [(1, f"{span} tail-a"), (2, "short")], schema
        ).write.mode("append").parquet(src)
        q = SB.tiered_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt, n=8
        )
        q.awaitTermination()

        spark.createDataFrame(
            [(3, f"prefix {span} suffix"), (4, "also tiny")], schema
        ).write.mode("append").parquet(src)
        q = SB.tiered_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt, n=8
        )
        q.awaitTermination()

        got = {r["doc_id"]: r for r in spark.read.parquet(stats_d).collect()}
        assert set(got) == {1, 2, 3, 4}
        assert got[1]["n_dup_grams"] == 0
        assert got[3]["n_dup_grams"] == 1  # via history snapshot
        assert got[2]["n_grams"] == 0 and got[2]["n_dup_grams"] == 0
        assert got[4]["dup_gram_ppm"] == 0
        # store distinctness under cross-session registration
        grams = spark.read.parquet(gram_d).select("gk").collect()
        assert len(grams) == len({r["gk"] for r in grams})

    def test_kill_resume_exactly_once(self, spark, tmp_path):
        """Crash after a batch's stats+store writes but before its commit:
        replay sees the pre-batch state AND a snapshot that excludes the
        crashed epoch's registrations, so flags and the store's content
        come out exactly-once."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        schema = "doc_id long, text string"
        span = "alpha beta gamma delta epsilon zeta eta theta"
        for rows in [
            [(10, f"{span} one")],
            [(20, f"prefix {span} suffix")],
            [(30, f"{span} once more")],
        ]:
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        gram_d = str(tmp_path / "grams")
        stats_d, ckpt = str(tmp_path / "stats"), str(tmp_path / "ckpt")

        def crash_on_1(epoch_id: int) -> None:
            if epoch_id == 1:
                raise RuntimeError("injected crash after epoch-1 writes")

        q = SB.tiered_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt,
            n=8, max_files_per_trigger=1, on_batch=crash_on_1,
        )
        with pytest.raises(Exception, match="injected crash"):
            q.awaitTermination()

        q = SB.tiered_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt,
            n=8, max_files_per_trigger=1,
        )
        q.awaitTermination()
        by_doc = {}
        for r in spark.read.parquet(stats_d).collect():
            assert r["doc_id"] not in by_doc, f"doc {r['doc_id']} duplicated"
            by_doc[r["doc_id"]] = r
        assert set(by_doc) == {10, 20, 30}
        assert by_doc[10]["n_dup_grams"] == 0
        assert by_doc[20]["n_dup_grams"] == 1
        assert by_doc[30]["n_dup_grams"] == 1
        # store stayed distinct through the replayed registration
        grams = spark.read.parquet(gram_d).select("gk").collect()
        assert len(grams) == len({r["gk"] for r in grams})

    def test_state_rows_bounded_by_session_not_corpus(self, spark, tmp_path):
        """The boundedness claim itself: a second session re-processing
        only NEW docs whose grams are all in history keeps ZERO rows in
        keyed state (all membership answered by the snapshot)."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        schema = "doc_id long, text string"
        span = "red orange yellow green blue indigo violet ultraviolet"
        gram_d = str(tmp_path / "grams")
        stats_d, ckpt = str(tmp_path / "stats"), str(tmp_path / "ckpt")

        spark.createDataFrame([(1, span)], schema).write.mode(
            "append"
        ).parquet(src)
        q = SB.tiered_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt, n=8
        )
        q.awaitTermination()
        p1 = q.lastProgress["stateOperators"][0]
        assert p1["numRowsTotal"] >= 1  # session 1 holds its novel gram

        # session 2: same span in a new doc — history answers, state purged
        spark.createDataFrame([(2, span)], schema).write.mode(
            "append"
        ).parquet(src)
        q = SB.tiered_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt, n=8
        )
        q.awaitTermination()
        got = {r["doc_id"]: r for r in spark.read.parquet(stats_d).collect()}
        assert got[2]["n_dup_grams"] == 1
        p2 = q.lastProgress["stateOperators"][0]
        # the purge dropped session 1's row and nothing fresh was added
        assert p2["numRowsUpdated"] >= 1  # the purge rewrite itself
        assert p2["numRowsTotal"] <= p1["numRowsTotal"]

    def test_missing_store_behind_checkpoint_refuses(self, spark, tmp_path):
        """Deleting the gram store while keeping the checkpoint must be a
        LOUD failure — continuing would silently forget corpus history."""
        import shutil as _sh

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        schema = "doc_id long, text string"
        span = "uno dos tres cuatro cinco seis siete ocho"
        gram_d = str(tmp_path / "grams")
        stats_d, ckpt = str(tmp_path / "stats"), str(tmp_path / "ckpt")
        spark.createDataFrame([(1, span)], schema).write.mode(
            "append"
        ).parquet(src)
        q = SB.tiered_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt, n=8
        )
        q.awaitTermination()
        _sh.rmtree(gram_d)
        spark.createDataFrame([(2, span)], schema).write.mode(
            "append"
        ).parquet(src)
        with pytest.raises(ValueError, match="store.*missing"):
            SB.tiered_substring_stream(
                spark, src, schema, gram_d, stats_d, ckpt, n=8
            )

    def test_fresh_checkpoint_against_existing_store_refuses(
        self, spark, tmp_path
    ):
        """A brand-new checkpoint pointed at a store with history would
        overwrite epoch=0 registrations — refuse before starting."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        schema = "doc_id long, text string"
        span = "eins zwei drei vier fuenf sechs sieben acht"
        gram_d = str(tmp_path / "grams")
        stats_d, ckpt = str(tmp_path / "stats"), str(tmp_path / "ckpt")
        spark.createDataFrame([(1, span)], schema).write.mode(
            "append"
        ).parquet(src)
        q = SB.tiered_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt, n=8
        )
        q.awaitTermination()
        with pytest.raises(ValueError, match="brand new"):
            SB.tiered_substring_stream(
                spark, src, schema, gram_d,
                str(tmp_path / "stats2"), str(tmp_path / "ckpt2"), n=8
            )


class TestBloomSubstring:
    """The bounded-memory stream (streaming/substring.bloom_substring_stream):
    on-disk sorted-run history, a memory-capped Bloom screen, row-group
    point-lookup verification, session-delta epoch dirs."""

    def test_single_batch_equals_batch_operator(self, spark, sf_dir, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
            dedup as D,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        docs = load_table(spark, sf_dir, "documents")
        src = str(tmp_path / "src")
        docs.select("doc_id", "text").write.parquet(src)
        q = SB.bloom_substring_stream(
            spark, src, "doc_id long, text string",
            str(tmp_path / "grams"), str(tmp_path / "stats"),
            str(tmp_path / "ckpt"), n=8,
        )
        q.awaitTermination()
        got = sorted(
            map(
                tuple,
                spark.read.parquet(str(tmp_path / "stats"))
                .drop("epoch")
                .collect(),
            )
        )
        want = sorted(map(tuple, D.ngram_dup_stats(docs, n=8).collect()))
        assert got == want

    def test_cross_session_flags_and_sparse_verify(self, spark, tmp_path):
        """Session 2 flags a session-1 gram via Bloom screen + exact
        verify; a mostly-novel batch verifies only the sparse positive
        set (true dups + Bloom false positives), not the whole batch."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        schema = "doc_id long, text string"
        span = "one two three four five six seven eight"
        gram_d = str(tmp_path / "grams")
        stats_d, ckpt = str(tmp_path / "stats"), str(tmp_path / "ckpt")

        spark.createDataFrame(
            [(1, f"{span} tail-a"), (2, "short")], schema
        ).write.mode("append").parquet(src)
        q = SB.bloom_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt, n=8
        )
        q.awaitTermination()

        novel_tail = " ".join(f"w{i}" for i in range(40))
        m2: dict = {}
        spark.createDataFrame(
            [(3, f"prefix {span} suffix"), (4, f"fresh {novel_tail}")],
            schema,
        ).write.mode("append").parquet(src)
        q = SB.bloom_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt, n=8, metrics=m2
        )
        q.awaitTermination()

        got = {r["doc_id"]: r for r in spark.read.parquet(stats_d).collect()}
        assert set(got) == {1, 2, 3, 4}
        assert got[1]["n_dup_grams"] == 0
        assert got[3]["n_dup_grams"] == 1  # via bloom + point lookup
        assert got[2]["n_grams"] == 0 and got[2]["n_dup_grams"] == 0
        assert got[4]["n_dup_grams"] == 0  # all-novel doc untouched
        (m,) = m2.values()
        # sparse verify: far fewer lookups than batch grams (1 true dup +
        # possible FPs), and the bitmap is the sized cap, not the corpus
        assert m["verify_gks"] < m["batch_gks"]
        # Per-bucket floor clamp at tiny corpora: only buckets that hold
        # history grams carry a bitmap (>= 16 B each); empty buckets
        # answer "absent" exactly with no bitmap at all.
        assert m["bloom_bytes"] >= 16 and m["bloom_bytes"] % 16 == 0
        grams = spark.read.parquet(gram_d).select("gk").collect()
        assert len(grams) == len({r["gk"] for r in grams})

    def test_tiny_bloom_false_positives_stay_exact(
        self, spark, sf_dir, tmp_path
    ):
        """A deliberately undersized bitmap (64 B for ~23k grams — FP
        rate near 1) floods the verify path with false positives but the
        FLAGS stay exact: the screen is an optimization, never an
        answer.  This is the memory-cap degradation contract."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
            dedup as D,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        half = docs.filter("doc_id % 2 = 0")
        rest = docs.filter("doc_id % 2 = 1")
        src = str(tmp_path / "src")
        half.write.mode("append").parquet(src)
        gram_d = str(tmp_path / "grams")
        stats_d, ckpt = str(tmp_path / "stats"), str(tmp_path / "ckpt")
        q = SB.bloom_substring_stream(
            spark, src, "doc_id long, text string", gram_d, stats_d, ckpt,
            n=8, bloom_bytes=64,
        )
        q.awaitTermination()
        m2: dict = {}
        rest.write.mode("append").parquet(src)
        q = SB.bloom_substring_stream(
            spark, src, "doc_id long, text string", gram_d, stats_d, ckpt,
            n=8, bloom_bytes=64, metrics=m2,
        )
        q.awaitTermination()
        (m,) = m2.values()
        assert m["bloom_bytes"] == 64  # explicit cap honored
        assert m["verify_gks"] > m["batch_gks"] // 2  # FP flood engaged
        # exactness despite the flood: union run == batch operator
        got = sorted(
            map(
                tuple,
                spark.read.parquet(stats_d).drop("epoch").collect(),
            )
        )
        # batch twin: session-2 docs judged against session-1 history +
        # themselves == one-shot operator over the union ONLY for grams;
        # easiest exact oracle is an uninterrupted single-session run
        gram2, stats2, ckpt2 = (
            str(tmp_path / "g2"), str(tmp_path / "s2"), str(tmp_path / "c2")
        )
        src2 = str(tmp_path / "src2")
        half.write.mode("append").parquet(src2)
        q = SB.bloom_substring_stream(
            spark, src2, "doc_id long, text string", gram2, stats2, ckpt2,
            n=8,  # roomy bitmap
        )
        q.awaitTermination()
        rest.write.mode("append").parquet(src2)
        q = SB.bloom_substring_stream(
            spark, src2, "doc_id long, text string", gram2, stats2, ckpt2,
            n=8,
        )
        q.awaitTermination()
        want = sorted(
            map(
                tuple,
                spark.read.parquet(stats2).drop("epoch").collect(),
            )
        )
        assert got == want

    def test_kill_resume_exactly_once(self, spark, tmp_path):
        """Crash after a batch's stats+store writes but before its
        commit: the replay excludes the crashed epoch from the session
        delta and the history cut, so flags and store content come out
        exactly-once."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        schema = "doc_id long, text string"
        span = "alpha beta gamma delta epsilon zeta eta theta"
        for rows in [
            [(10, f"{span} one")],
            [(20, f"prefix {span} suffix")],
            [(30, f"{span} once more")],
        ]:
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        gram_d = str(tmp_path / "grams")
        stats_d, ckpt = str(tmp_path / "stats"), str(tmp_path / "ckpt")

        def crash_on_1(epoch_id: int) -> None:
            if epoch_id == 1:
                raise RuntimeError("injected crash after epoch-1 writes")

        q = SB.bloom_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt,
            n=8, max_files_per_trigger=1, on_batch=crash_on_1,
        )
        with pytest.raises(Exception, match="injected crash"):
            q.awaitTermination()

        q = SB.bloom_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt,
            n=8, max_files_per_trigger=1,
        )
        q.awaitTermination()
        by_doc = {}
        for r in spark.read.parquet(stats_d).collect():
            assert r["doc_id"] not in by_doc, f"doc {r['doc_id']} duplicated"
            by_doc[r["doc_id"]] = r
        assert set(by_doc) == {10, 20, 30}
        assert by_doc[10]["n_dup_grams"] == 0
        assert by_doc[20]["n_dup_grams"] == 1
        assert by_doc[30]["n_dup_grams"] == 1
        grams = spark.read.parquet(gram_d).select("gk").collect()
        assert len(grams) == len({r["gk"] for r in grams})

    def test_many_batch_single_session_delta(self, spark, tmp_path):
        """One UNINTERRUPTED session draining 4 micro-batches: from epoch
        2 on, the session-delta probe reads MULTIPLE sibling epoch dirs —
        which Spark's partition discovery refuses without a basePath
        anchor ("conflicting directory structures", latent until r10's
        steady-state probe because every earlier test/probe drained one
        batch per session or resumed between batches).  Flags must come
        out exactly as the batch semantics say."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        schema = "doc_id long, text string"
        span = "alpha beta gamma delta epsilon zeta eta theta"
        for rows in [
            [(10, f"{span} one")],
            [(20, "nothing shared here at all truly unique words")],
            [(30, f"prefix {span} suffix")],
            [(40, f"{span} once more")],
        ]:
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        gram_d = str(tmp_path / "grams")
        stats_d, ckpt = str(tmp_path / "stats"), str(tmp_path / "ckpt")
        q = SB.bloom_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt,
            n=8, max_files_per_trigger=1,
        )
        q.awaitTermination()
        by_doc = {
            r["doc_id"]: r["n_dup_grams"]
            for r in spark.read.parquet(stats_d).collect()
        }
        # doc 30's span grams were registered by epoch 0 (doc 10) — at
        # epoch 2 the delta probe reads epochs {0, 1}, two sibling dirs.
        assert by_doc == {10: 0, 20: 0, 30: 1, 40: 1}

    def test_guards_shared_with_history_forms(self, spark, tmp_path):
        """Missing store behind a marked checkpoint and a brand-new
        checkpoint against a store with history both refuse loudly
        (shared _session_history_guards)."""
        import shutil as _sh

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        schema = "doc_id long, text string"
        span = "uno dos tres cuatro cinco seis siete ocho"
        gram_d = str(tmp_path / "grams")
        stats_d, ckpt = str(tmp_path / "stats"), str(tmp_path / "ckpt")
        spark.createDataFrame([(1, span)], schema).write.mode(
            "append"
        ).parquet(src)
        q = SB.bloom_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt, n=8
        )
        q.awaitTermination()
        with pytest.raises(ValueError, match="brand new"):
            SB.bloom_substring_stream(
                spark, src, schema, gram_d,
                str(tmp_path / "stats2"), str(tmp_path / "ckpt2"), n=8
            )
        _sh.rmtree(gram_d)
        spark.createDataFrame([(2, span)], schema).write.mode(
            "append"
        ).parquet(src)
        with pytest.raises(ValueError, match="store.*missing"):
            SB.bloom_substring_stream(
                spark, src, schema, gram_d, stats_d, ckpt, n=8
            )

    def test_inline_compaction_folds_history_and_stays_exact(
        self, spark, sf_dir, tmp_path
    ):
        """compact_every folds only PRE-SESSION history runs (below the
        session floor) and rebuilds the run index; flags match an
        uncompacted twin bit-for-bit, and a crash right after a
        compacting epoch resumes exactly-once."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        third = docs.count() // 3
        parts = [
            docs.filter(f"doc_id % 3 = {i}").coalesce(1) for i in range(3)
        ]
        schema = "doc_id long, text string"

        def run(base: str, compact_every=None, crash_epoch=None):
            src = str(tmp_path / base / "src")
            gram_d = str(tmp_path / base / "grams")
            s_d = str(tmp_path / base / "stats")
            ckpt = str(tmp_path / base / "ckpt")
            # three seed SESSIONS -> three history epochs (runs)
            for p in parts[:2]:
                p.write.mode("append").parquet(src)
                q = SB.bloom_substring_stream(
                    spark, src, schema, gram_d, s_d, ckpt, n=8
                )
                q.awaitTermination()
            parts[2].write.mode("append").parquet(src)

            def crash(epoch_id: int) -> None:
                if crash_epoch is not None and epoch_id == crash_epoch:
                    raise RuntimeError("injected crash after compaction")

            q = SB.bloom_substring_stream(
                spark, src, schema, gram_d, s_d, ckpt, n=8,
                compact_every=compact_every, on_batch=crash,
            )
            if crash_epoch is not None:
                with pytest.raises(Exception, match="injected crash"):
                    q.awaitTermination()
                q = SB.bloom_substring_stream(
                    spark, src, schema, gram_d, s_d, ckpt, n=8,
                    compact_every=compact_every,
                )
            q.awaitTermination()
            rows = sorted(
                map(
                    tuple,
                    spark.read.parquet(s_d).drop("epoch").collect(),
                )
            )
            import os as _os

            epochs = sorted(
                d for d in _os.listdir(gram_d) if d.startswith("epoch=")
            )
            return rows, epochs

        plain_rows, plain_epochs = run("plain")
        assert len(plain_epochs) == 3  # one run per session, unfolded
        # session 3 = epoch 2 -> 2 % 2 == 0 triggers the inline fold
        comp_rows, comp_epochs = run("comp", compact_every=2)
        assert comp_rows == plain_rows
        # history epochs 0,1 folded into epoch=1; session epoch 2 kept
        assert comp_epochs == ["epoch=1", "epoch=2"]
        # crash AFTER the compacting epoch's writes -> resume exactly-once
        crash_rows, _ = run(
            "crash", compact_every=2, crash_epoch=2
        )
        assert crash_rows == plain_rows


class TestBloomArtifacts:
    """Persisted membership artifacts (streaming/bloomstore.py): per-
    bucket bitmaps + run index as store artifacts with watermark-
    incremental maintenance — session start reads O(new runs), not one
    full store pass (VERDICT r7 next-round #1)."""

    @staticmethod
    def _seed_sessions(spark, tmp_path, base, n_sessions=3, docs_per=2):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        src = str(tmp_path / base / "src")
        gram_d = str(tmp_path / base / "grams")
        stats_d = str(tmp_path / base / "stats")
        ckpt = str(tmp_path / base / "ckpt")
        schema = "doc_id long, text string"
        metrics_per_session = []
        doc = 0
        for s in range(n_sessions):
            rows = []
            for _ in range(docs_per):
                words = " ".join(f"s{s}w{doc}x{i}" for i in range(12))
                rows.append((doc, words))
                doc += 1
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            m: dict = {}
            q = SB.bloom_substring_stream(
                spark, src, schema, gram_d, stats_d, ckpt, n=8, metrics=m
            )
            q.awaitTermination()
            metrics_per_session.append(m)
        return src, gram_d, stats_d, ckpt, schema, metrics_per_session

    def test_session_start_folds_only_new_epochs(self, spark, tmp_path):
        """The manifest watermark makes session start incremental: after
        the initial build, each session folds exactly the PREVIOUS
        session's epochs and footer-reads zero already-indexed files
        (the per-epoch append covered them)."""
        *_, sessions = self._seed_sessions(
            spark, tmp_path, "inc", n_sessions=4
        )
        # session 2 is the initial artifact build: it folds session 1's
        # single epoch from a zero watermark
        (m2,) = sessions[1].values()
        assert m2["setup_folded_epochs"] == 1
        # sessions 3 and 4: exactly one pending epoch (the previous
        # session's), zero new footer reads (per-epoch append hit them)
        for m_dict in sessions[2:]:
            (m,) = m_dict.values()
            assert m["setup_folded_epochs"] == 1
            assert m["setup_new_index_files"] == 0
            assert m["setup_rebuilt_buckets"] == 0

    def test_artifacts_are_advisory_rebuild_on_loss(self, spark, tmp_path):
        """Deleting or corrupting the artifact dir never changes flags —
        the next session start just pays the full rebuild (the r7
        per-session cost)."""
        import shutil

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            bloomstore as BS,
            substring as SB,
        )

        src, gram_d, stats_d, ckpt, schema, _ = self._seed_sessions(
            spark, tmp_path, "loss", n_sessions=2
        )
        baseline = sorted(
            map(tuple, spark.read.parquet(stats_d).drop("epoch").collect())
        )
        meta = BS.meta_dir_for(gram_d)
        assert os.path.isdir(meta)
        shutil.rmtree(meta)
        span = "q1 q2 q3 q4 q5 q6 q7 q8"
        spark.createDataFrame(
            [(100, span), (101, f"pre {span} post")], schema
        ).coalesce(1).write.mode("append").parquet(src)
        m: dict = {}
        q = SB.bloom_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt, n=8, metrics=m
        )
        q.awaitTermination()
        (mm,) = m.values()
        # full rebuild: every committed epoch folded, every file indexed
        assert mm["setup_folded_epochs"] == 2
        assert mm["setup_new_index_files"] > 0
        got = {
            r["doc_id"]: r for r in spark.read.parquet(stats_d).collect()
        }
        assert got[101]["n_dup_grams"] == 1  # cross-session dup flagged
        # corrupt manifest -> same advisory fallback, no crash
        with open(f"{meta}/manifest.json", "w") as f:
            f.write("{not json")
        spark.createDataFrame(
            [(200, f"tail {span} again")], schema
        ).coalesce(1).write.mode("append").parquet(src)
        q = SB.bloom_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt, n=8
        )
        q.awaitTermination()
        got = {
            r["doc_id"]: r for r in spark.read.parquet(stats_d).collect()
        }
        assert got[200]["n_dup_grams"] == 1
        assert sorted(
            t
            for t in map(
                tuple, spark.read.parquet(stats_d).drop("epoch").collect()
            )
            if t[0] < 100
        ) == baseline

    def test_auto_compaction_caps_runs_across_sessions(
        self, spark, tmp_path
    ):
        """The unattended policy (auto_compact_runs): across 7 sessions
        with NO manual compact_store call, committed runs/bucket stays
        at the one-run floor + the uncompacted tail instead of growing
        one per session, the fold is driver-visible in setup metrics,
        and flags stay exact (the final cross-session dup is found)."""
        import glob as _glob

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        src = str(tmp_path / "auto" / "src")
        gram_d = str(tmp_path / "auto" / "grams")
        stats_d = str(tmp_path / "auto" / "stats")
        ckpt = str(tmp_path / "auto" / "ckpt")
        schema = "doc_id long, text string"
        span = "c1 c2 c3 c4 c5 c6 c7 c8"
        sessions = []
        max_committed_runs = []
        for s in range(7):
            text = (
                f"pre {span} post"  # dup vs session 0 from session 1 on
                if s
                else f"{span} tail"
            )
            # enough novel grams (>64) that every session touches most
            # of the 64 buckets — committed runs/bucket then really does
            # grow one per session without the policy
            extra = " ".join(f"s{s}n{i}" for i in range(80))
            spark.createDataFrame(
                [(s * 10, text), (s * 10 + 1, extra)], schema
            ).coalesce(1).write.mode("append").parquet(src)
            m: dict = {}
            q = SB.bloom_substring_stream(
                spark, src, schema, gram_d, stats_d, ckpt, n=8,
                metrics=m, auto_compact_runs=2,
            )
            q.awaitTermination()
            sessions.append(m)
            files = _glob.glob(f"{gram_d}/epoch=*/bucket=*/*.parquet")
            per_bucket: dict = {}
            for f in files:
                b = f.split("bucket=")[1].split("/")[0]
                per_bucket[b] = per_bucket.get(b, 0) + 1
            max_committed_runs.append(max(per_bucket.values()))
        # without the policy runs/bucket would reach 7; the threshold-2
        # policy folds pre-session history whenever it exceeds 2
        assert max(max_committed_runs) <= 4
        fired = [
            s
            for s, m in enumerate(sessions)
            for e in m.values()
            if "setup_auto_compacted_from_runs" in e
        ]
        assert fired, "the policy never fired in 7 sessions"
        got = {r["doc_id"]: r for r in spark.read.parquet(stats_d).collect()}
        # session 1 shares one window with session 0 ("c1..c8"); from
        # session 2 on the whole text is a session-1 re-run — all three
        # windows are history dups, across every fold the policy did
        assert got[10]["n_dup_grams"] == 1
        for s in range(2, 7):
            assert got[s * 10]["n_dup_grams"] == 3, s
        assert got[0]["n_dup_grams"] == 0

    def test_scheme_paths_without_posix_shortcut(
        self, spark, tmp_path, monkeypatch
    ):
        """The ADVICE-r7 URI fix on a scheme-qualified path (VERDICT r8
        next-round #3): full artifact rebuild + an incremental reconcile
        + a bloom-probe/row-group verify against ``file://``-prefixed
        store and meta dirs with the posix shortcut monkeypatched OFF —
        every byte of artifact I/O goes through the pyarrow-fs branch
        (what a real cluster scheme exercises).  Footer/fold jobs are
        forced onto the driver because a pickled-by-reference executor
        task reimports the module and would not see the patch; the I/O
        helpers under test are the very functions those tasks run."""
        import shutil

        import numpy as np

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            bloomstore as BS,
        )

        src, gram_d, stats_d, ckpt, schema, _ = self._seed_sessions(
            spark, tmp_path, "scheme", n_sessions=2
        )
        meta = BS.meta_dir_for(gram_d)
        shutil.rmtree(meta)  # force the FULL build through the seam
        monkeypatch.setattr(BS, "_local_path", lambda p: None)
        monkeypatch.setattr(BS, "_DRIVER_FOOTER_MAX", 1 << 30)
        monkeypatch.setattr(BS, "_DRIVER_FOLD_MAX", 1 << 30)
        gram_uri = f"file://{gram_d}"
        metrics: dict = {}
        art = BS.ensure_artifacts(spark, gram_uri, 1, metrics=metrics)
        assert art is not None and art["total_grams"] > 0
        assert metrics["new_index_files"] > 0
        assert os.path.exists(os.path.join(meta, BS.MANIFEST_NAME))

        store = spark.read.parquet(gram_d).select("gk").collect()
        gks = sorted({r["gk"] for r in store})
        k = art["k"]

        def screen(gk: int) -> tuple[bool, bool]:
            """(bloom_positive, verified_in_history) through the SAME
            patched helpers the probe tasks use."""
            b = gk % 64
            entry = art["buckets"].get(b)
            if entry is None:
                return False, False
            assert entry[0].startswith("file:")
            pos = bool(
                BS._bloom_probe(
                    np.array([gk], np.int64), BS.bitmap_for(entry[0]), k
                )[0]
            )
            found = False
            for path, _mins, _maxs in art["index"].get(b, []):
                assert path.startswith("file:")
                pf = BS.open_parquet(path)
                for rg in range(pf.metadata.num_row_groups):
                    col = (
                        pf.read_row_group(rg, columns=["gk"])
                        .column("gk")
                        .to_numpy()
                    )
                    if gk in col:
                        found = True
            return pos, found

        for gk in gks[:16]:
            pos, found = screen(gk)
            assert pos and found  # no false negatives, ever
        absent = gks[-1] + 987654321
        pos, found = screen(absent)
        assert not found  # a Bloom FP is allowed; the verify is definite

        # incremental reconcile through the same seam: nothing pending
        m2: dict = {}
        art2 = BS.ensure_artifacts(spark, gram_uri, 1, metrics=m2)
        assert m2["folded_epochs"] == 0 and m2["new_index_files"] == 0
        assert art2["total_grams"] == art["total_grams"]
        # per-epoch segment append is idempotent over the scheme'd path
        BS.append_run_entries(spark, gram_uri, 1)
        art3 = BS.ensure_artifacts(spark, gram_uri, 1)
        assert art3["total_grams"] == art["total_grams"]

    def test_external_compaction_reconciles_index(self, spark, tmp_path):
        """A maintenance-window compact_store between sessions rewrites
        every run file; the next session start drops the dead index
        entries, footer-reads the consolidated runs, does NOT re-fold
        bitmaps (membership-equivalent), and flags stay exact."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            stores,
            substring as SB,
        )

        src, gram_d, stats_d, ckpt, schema, sessions = self._seed_sessions(
            spark, tmp_path, "extc", n_sessions=3
        )
        result = stores.compact_store(
            spark, gram_d, "bucket", sort_cols=["gk"]
        )
        assert result["compacted"]
        # re-emit one known span from session 0 -> must still flag
        first_doc_words = " ".join(f"s0w0x{i}" for i in range(12))
        m: dict = {}
        spark.createDataFrame(
            [(500, f"echo {first_doc_words}")], schema
        ).coalesce(1).write.mode("append").parquet(src)
        q = SB.bloom_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt, n=8, metrics=m
        )
        q.awaitTermination()
        (mm,) = m.values()
        assert mm["setup_new_index_files"] > 0  # consolidated runs read
        assert mm["setup_folded_epochs"] <= 1  # previous session only
        got = {
            r["doc_id"]: r for r in spark.read.parquet(stats_d).collect()
        }
        # doc 500 contains doc 0's full 12-word span -> 5 dup 8-grams
        assert got[500]["n_dup_grams"] == 5

    def test_bucket_growth_rebuild_keeps_bits_per_gram(
        self, spark, sf_dir, tmp_path
    ):
        """A bucket that outgrows its bits/gram budget is rebuilt at the
        next power of two from its own history slice — total bitmap
        bytes grow with the corpus while flags stay exact."""
        import json as _json

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            bloomstore as BS,
            substring as SB,
        )

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        small = docs.filter("doc_id % 20 = 0")
        rest = docs.filter("doc_id % 20 <> 0")
        src = str(tmp_path / "src")
        gram_d = str(tmp_path / "grams")
        stats_d, ckpt = str(tmp_path / "stats"), str(tmp_path / "ckpt")
        schema = "doc_id long, text string"
        for part in (small, rest):
            part.coalesce(1).write.mode("append").parquet(src)
            q = SB.bloom_substring_stream(
                spark, src, schema, gram_d, stats_d, ckpt, n=8
            )
            q.awaitTermination()
        with open(f"{BS.meta_dir_for(gram_d)}/manifest.json") as f:
            man1 = _json.load(f)
        total1 = sum(v["m_bytes"] for v in man1["buckets"].values())
        # third session triggers the fold of session 2's large epoch:
        # most buckets outgrew their small-session sizing and rebuild
        m: dict = {}
        spark.createDataFrame(
            [(10_000_000, "growth probe tail")], schema
        ).coalesce(1).write.mode("append").parquet(src)
        q = SB.bloom_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt, n=8, metrics=m
        )
        q.awaitTermination()
        (mm,) = m.values()
        assert mm["setup_rebuilt_buckets"] > 0
        with open(f"{BS.meta_dir_for(gram_d)}/manifest.json") as f:
            man2 = _json.load(f)
        total2 = sum(v["m_bytes"] for v in man2["buckets"].values())
        assert total2 > total1
        # bits/gram stayed near budget: sized for n at ~10 bits/gram,
        # power-of-two rounding bounds it within [budget, 2x budget+]
        n2 = sum(v["n_grams"] for v in man2["buckets"].values())
        assert total2 * 8 >= 10.0 * n2 * 0.9
        # stale bitmap versions GC'd: files on disk == manifest refs
        names = set(os.listdir(BS.meta_dir_for(gram_d)))
        refs = {v["file"] for v in man2["buckets"].values()}
        assert {n for n in names if n.startswith("bm-")} == refs

    def test_uri_scheme_paths_resolve(self, tmp_path):
        """ADVICE r7: scheme-qualified paths must survive — the local
        helpers normalize file: URIs and plain paths identically."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            bloomstore as BS,
        )

        p = str(tmp_path / "x.bin")
        BS._write_bytes_atomic(p, b"abc")
        assert BS._read_bytes(f"file:{p}") == b"abc"
        assert BS._read_bytes(f"file://{p}") == b"abc"
        assert BS._local_path("s3a://bucket/k") is None
        assert BS._local_path("/plain/path") == "/plain/path"
        assert BS._local_path("file:///a/b") == "/a/b"

    def test_per_epoch_append_writes_segments_reconcile_consolidates(
        self, spark, tmp_path
    ):
        """r8 v2 index: per-epoch maintenance appends an O(new files)
        SEGMENT (never rewriting the whole index per batch); the next
        session-start reconcile folds the segment list back to ONE
        consolidated file and GC's the rest."""
        import json as _json

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            bloomstore as BS,
        )

        _, gram_d, *_ = self._seed_sessions(
            spark, tmp_path, "seg", n_sessions=3
        )
        meta = BS.meta_dir_for(gram_d)
        with open(f"{meta}/manifest.json") as f:
            man = _json.load(f)
        # after a session: one consolidated segment from the session
        # start + at most one per-epoch append segment from the session
        names = man["runs_files"]
        assert 1 <= len(names) <= 2, names
        for nm in names:
            assert os.path.exists(f"{meta}/{nm}"), nm
        # superseded segments were GC'd / never accumulated
        on_disk = {
            n for n in os.listdir(meta) if n.startswith("runs-")
        }
        assert on_disk == set(names)
        # the index covers every store file exactly once
        entries = BS._read_runs_parquet(meta, names)
        store_files = {
            p for (_, _, p) in BS._glob_store_files(spark, gram_d)
        }
        assert {e[2] for e in entries} == store_files
        assert len(entries) == len({e[2] for e in entries})

    def test_midsession_fold_refreshes_bitmap_descriptors(
        self, spark, tmp_path
    ):
        """r8 review (medium): a session whose start leaves the manifest
        watermark STALE (the previous session registered no novel grams,
        so no store files advanced past the watermark — but the
        checkpoint committed) and whose inline compaction then folds
        pending history WRITES new bitmap versions and GC's the old
        files; the NEXT batch's probe must read the refreshed
        descriptors, not the stale broadcast (pre-fix:
        FileNotFoundError in bitmap_for)."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        src = str(tmp_path / "mid" / "src")
        gram_d = str(tmp_path / "mid" / "grams")
        stats_d = str(tmp_path / "mid" / "stats")
        ckpt = str(tmp_path / "mid" / "ckpt")
        schema = "doc_id long, text string"
        span = " ".join(f"mw{i}" for i in range(12))

        # session A: novel corpus over TWO epochs (two files, one per
        # trigger) — compact_store's bounded mode folds only when >= 2
        # epochs sit below the floor, so a single-epoch history would
        # leave session C's inline compaction a no-op and this test
        # inert for its stated purpose (r8 review).
        spark.createDataFrame([(0, span)], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        spark.createDataFrame(
            [(1, "other words entirely " + " ".join(
                f"ow{i}" for i in range(8)))],
            schema,
        ).coalesce(1).write.mode("append").parquet(src)
        q = SB.bloom_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt, n=8,
            max_files_per_trigger=1,
        )
        q.awaitTermination()
        # session B: EXACT duplicate of doc 0 -> zero novel grams, no
        # store write, checkpoint advances, watermark goes stale
        spark.createDataFrame([(2, span)], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = SB.bloom_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt, n=8
        )
        q.awaitTermination()
        # session C: two single-file batches with inline compaction —
        # batch 1 folds the stale-watermark history (new bitmap files,
        # old GC'd), batch 2 probes with the refreshed descriptors
        spark.createDataFrame(
            [(3, "fresh " + " ".join(f"fw{i}" for i in range(10)))], schema
        ).coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame(
            [(4, f"echo {span}")], schema
        ).coalesce(1).write.mode("append").parquet(src)
        q = SB.bloom_substring_stream(
            spark,
            src,
            schema,
            gram_d,
            stats_d,
            ckpt,
            n=8,
            compact_every=1,
            max_files_per_trigger=1,
        )
        q.awaitTermination()
        got = {
            r["doc_id"]: r for r in spark.read.parquet(stats_d).collect()
        }
        assert got[2]["n_dup_grams"] == got[2]["n_grams"] == 5
        # doc 4 contains doc 0's full 12-word span -> its 5 grams dup
        assert got[4]["n_dup_grams"] == 5
        # the inline compaction genuinely fired AND the reconcile
        # re-folded: history consolidated below the session floor and
        # the bitmap files on disk are the refreshed generation exactly
        # (stale versions GC'd — the pre-fix crash vector)
        import glob as _glob
        import json as _json

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            bloomstore as BS,
        )

        epochs = sorted(
            int(d.rsplit("=", 1)[1])
            for d in _glob.glob(f"{gram_d}/epoch=*")
        )
        assert epochs[0] == 2, (epochs, "history not consolidated")
        meta = BS.meta_dir_for(gram_d)
        with open(f"{meta}/manifest.json") as f:
            man = _json.load(f)
        on_disk = {
            n for n in os.listdir(meta) if n.startswith("bm-")
        }
        refs = {v["file"] for v in man["buckets"].values()}
        assert on_disk == refs

    def test_interrupted_manual_swap_recovers_without_compact_every(
        self, spark, tmp_path
    ):
        """ADVICE r7 (medium): a crash inside a MANUAL maintenance-window
        compact_store swap, followed by a restart WITHOUT compact_every,
        must still repair the store at session start — otherwise the
        aside epoch's grams are silently treated as novel."""
        import glob as _glob

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            substring as SB,
        )

        src, gram_d, stats_d, ckpt, schema, _ = self._seed_sessions(
            spark, tmp_path, "swap", n_sessions=3
        )
        # Simulate a death between the aside rename and the rename-in of
        # a manual compaction: one committed epoch dir exists only as
        # the aside.
        target = sorted(
            int(d.rsplit("=", 1)[1])
            for d in _glob.glob(f"{gram_d}/epoch=*")
        )[0]
        os.rename(
            f"{gram_d}/epoch={target}",
            gram_d + f".compact_old_epoch={target}",
        )
        # Restart WITHOUT compact_every and re-emit a span registered in
        # the aside-renamed epoch (doc 0 lives in epoch 0).
        first_doc_words = " ".join(f"s0w0x{i}" for i in range(12))
        spark.createDataFrame(
            [(900, f"replay {first_doc_words}")], schema
        ).coalesce(1).write.mode("append").parquet(src)
        q = SB.bloom_substring_stream(
            spark, src, schema, gram_d, stats_d, ckpt, n=8
        )
        q.awaitTermination()
        assert not os.path.exists(gram_d + f".compact_old_epoch={target}")
        got = {
            r["doc_id"]: r for r in spark.read.parquet(stats_d).collect()
        }
        assert got[900]["n_dup_grams"] == 5  # aside epoch's grams seen


def test_curation_maintenance_converges_to_batch(spark, sf_dir, tmp_path):
    """Incremental curation (streaming/curation.py, r11): after draining
    the same corpus — in EITHER arrival order — the accepted-survivor
    view equals curate_corpus(use_minhash=True, max_df=None) row for
    row: the gate is stateless, min-id-per-fingerprint is a property of
    the fingerprint-log SET, and the kept-kept restriction of the
    incremental pair graph reproduces the batch operator's pair set
    (per-doc MinHash signatures make banding pair-local)."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
        dedup as D,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        curation as SC,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    lo, hi = docs.filter(F.col("doc_id") <= mid), docs.filter(
        F.col("doc_id") > mid
    )
    twin = {
        (r["id"], r["lang"], r["n_tokens"], r["exact_dups"])
        for r in D.curate_corpus(
            docs, use_minhash=True, max_df=None
        ).collect()
    }
    assert twin
    for name, parts in {"fwd": [lo, hi], "rev": [hi, lo]}.items():
        store = str(tmp_path / f"store_{name}")
        for part in parts:
            SC.curation_maintain_batch(part, store)
        got = {
            (r["id"], r["lang"], r["n_tokens"], r["exact_dups"])
            for r in SC.curation_survivors(spark, store).collect()
        }
        assert got == twin, name


def test_curation_maintenance_stream_replay_and_restart(spark, tmp_path):
    """The real streaming path: two micro-batches (maxFilesPerTrigger=1)
    into fresh stores, then a RESTART with one more arrival file — the
    checkpoint skips processed files and the stores carry state, so the
    survivor view reflects all three arrivals exactly once (epoch-keyed
    store writes make replays idempotent, the neardup-store contract)."""
    import os as _os

    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
        dedup as D,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        curation as SC,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
        "psi omega one two three four five six seven"
    )
    batches = [
        [(1, "en", base), (2, "en", base)],                 # exact dup pair
        [(10, "en", base + " extra"), (11, "de", base + " other tail")],
        [(20, "en", "short"), (21, "fr", base + " extra indeed")],
    ]
    src = str(tmp_path / "src")
    _os.makedirs(src)
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    def add_file(i: int) -> None:
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(
            batches[i], "doc_id long, lang string, text string"
        ).coalesce(1).write.parquet(stage)
        part = next(
            f for f in _os.listdir(stage) if f.endswith(".parquet")
        )
        _os.rename(f"{stage}/{part}", f"{src}/batch{i}.parquet")

    add_file(0)
    add_file(1)
    SC.curation_maintenance_stream(
        spark, src, "doc_id long, lang string, text string", store, ckpt,
        max_files_per_trigger=1,
    ).awaitTermination()
    add_file(2)
    SC.curation_maintenance_stream(
        spark, src, "doc_id long, lang string, text string", store, ckpt,
        max_files_per_trigger=1,
    ).awaitTermination()

    surv = {
        (r["id"], r["exact_dups"])
        for r in SC.curation_survivors(spark, store).collect()
    }
    # doc 2 is an exact dup of 1 (dropped, counted); 10/21 near-dup 1's
    # cluster (dropped: 1 is the min-id representative); 11 survives (its
    # tail differs enough only if jaccard < 0.8 — assert against the
    # batch twin rather than hand-derived) ; 20 fails the token gate.
    docs = spark.createDataFrame(
        [r for b in batches for r in b],
        "doc_id long, lang string, text string",
    )
    twin = {
        (r["id"], r["exact_dups"])
        for r in D.curate_corpus(
            docs, use_minhash=True, max_df=None
        ).collect()
    }
    assert surv == twin
    assert (1, 2) in surv  # rep of the exact-dup pair, dup counted
    assert all(i != 20 for i, _ in surv)  # gate


def test_curation_v2_maintenance_converges_to_batch(spark, sf_dir, tmp_path):
    """Incremental V2 curation (streaming/curation.py, r12 — VERDICT r11
    #1): after draining the same corpus in EITHER arrival order, the
    survivor+selection view equals ``curate_corpus_v2(min_stops=0,
    use_minhash=True, max_df=None)`` on ALL 13 output columns.  The
    corpus-stat stages are what's new vs the v1 test: the tercile LM is
    recomposed from the per-epoch token-frequency partials, per-doc
    surprisal from the doc-token store, and the DSIR bucket LMs from
    survivor-restricted sums over the per-doc feature-bucket store —
    none of which may depend on arrival order."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
        dedup as D,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        curation as SC,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    lo, hi = docs.filter(F.col("doc_id") <= mid), docs.filter(
        F.col("doc_id") > mid
    )
    twin = {
        tuple(r)
        for r in D.curate_corpus_v2(
            docs, min_stops=0, use_minhash=True, max_df=None
        ).collect()
    }
    assert twin
    for name, parts in {"fwd": [lo, hi], "rev": [hi, lo]}.items():
        store = str(tmp_path / f"store2_{name}")
        for part in parts:
            SC.curation_v2_maintain_batch(part, store, min_stops=0)
        got = {
            tuple(r)
            for r in SC.curation_v2_survivors(spark, store).collect()
        }
        assert got == twin, name


def test_curation_v2_maintenance_stream_restart(spark, sf_dir, tmp_path):
    """The real streaming path for the v2 maintenance: two arrival files
    drained (maxFilesPerTrigger=1), then a RESTART with a third — the
    checkpoint skips processed files, the five stores carry state, and
    the final view equals the batch composition over all three arrivals
    exactly once."""
    import os as _os

    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
        dedup as D,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        curation as SC,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    c1 = lo + (hi - lo) // 3
    c2 = lo + 2 * (hi - lo) // 3
    slices = [
        docs.filter(F.col("doc_id") <= c1),
        docs.filter((F.col("doc_id") > c1) & (F.col("doc_id") <= c2)),
        docs.filter(F.col("doc_id") > c2),
    ]
    src = str(tmp_path / "src2")
    _os.makedirs(src)
    store = str(tmp_path / "store2")
    ckpt = str(tmp_path / "ckpt2")

    def add_file(i: int) -> None:
        stage = str(tmp_path / f"stage2_{i}")
        slices[i].coalesce(1).write.parquet(stage)
        part = next(
            f for f in _os.listdir(stage) if f.endswith(".parquet")
        )
        _os.rename(f"{stage}/{part}", f"{src}/batch{i}.parquet")

    add_file(0)
    add_file(1)
    SC.curation_v2_maintenance_stream(
        spark, src, "doc_id long, lang string, text string", store, ckpt,
        min_stops=0, max_files_per_trigger=1,
    ).awaitTermination()
    add_file(2)
    SC.curation_v2_maintenance_stream(
        spark, src, "doc_id long, lang string, text string", store, ckpt,
        min_stops=0, max_files_per_trigger=1,
    ).awaitTermination()
    got = {
        tuple(r)
        for r in SC.curation_v2_survivors(spark, store).collect()
    }
    twin = {
        tuple(r)
        for r in D.curate_corpus_v2(
            docs, min_stops=0, use_minhash=True, max_df=None
        ).collect()
    }
    assert got == twin and twin
