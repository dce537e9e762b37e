"""Throughput/concurrency probe for the r10 loopback service seams
(VERDICT r10 next-round #5): the batch engine has scale probes
everywhere; the serving seams had parity witnesses but only
one-user/tiny-fixture numbers.  Two measurements, results recorded in
BASELINE.md:

1. **SSE gateway fan-out** (streaming/serve.sse_http_server +
   serve_push_stream + http_push_sink_factory): N concurrent users x Q
   queries each through the REAL push stream -> gateway -> N concurrent
   SSE readers.  Verifies per-user delivery ORDER under concurrency
   (create -> createLink -> addMessage per hit, ranks ascending — the
   contract SSEOpenAIController.java:96-133's per-user Flux gives) and
   measures push wall, drain wall, and delivered events/s.

2. **Embed transport under a 429 storm** (functions/embed.http_transport
   + retrying_embedder + local_embedding_server): D docs, a planted
   fraction rate-limited twice each (429 -> retry -> retry -> 200), with
   the reference's 20 ms inter-call pacing (Function.java:45 —
   OPENAI_INVOCATION_INTERVAL; README.md:275 quotes the 1,440 req/min
   envelope that pacing enforces per JVM).  Measures docs/s and
   effective req/s per worker and for the job, against the pacing
   ceiling (workers / interval).

Usage: python scripts/seam_throughput_probe.py [n_users] [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (  # noqa: E402
    get_spark,
)


def probe_sse_backpressure(
    spark,
    n_users: int,
    n_queries: int,
    tmp: str,
    max_queue_events: int,
) -> dict:
    """r12 (VERDICT r11 #6): N users with BOUNDED per-user gateway queues
    and ONE deliberately-stalled reader (user000 never connects while
    the push runs).  Probes delivered as n_queries FILES
    (maxFilesPerTrigger=1 -> one micro-batch per query, 15 events per
    user per batch), so a live reader drains between bursts and the cap
    only has to absorb one burst; the stalled user accumulates all
    n_queries*15 events against the cap and overflows by drop-oldest-
    with-marker.  Asserts: every LIVE reader order-clean and lossless;
    the stalled user's server-side depth == cap, the dropped marker
    equals total-cap, and the retained payloads are the exact cyclic
    SUFFIX of the create/createLink/addMessage pattern."""
    import threading

    from pyspark.sql import functions as F

    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (  # noqa: E501
        pipeline as P,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (  # noqa: E501
        serve as SV,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.tables import (  # noqa: E501
        load_table,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    docs = load_table(spark, sf_dir, "documents")
    chunks, _ = P.ingest_documents(docs)
    chunks = chunks.cache()
    chunks.count()

    src = f"{tmp}/probes_bp_src"
    os.makedirs(src)
    for q in range(n_queries):
        rows = [
            (f"user{u:03d}", f"query {q} spark vector shuffle join {u}")
            for u in range(n_users)
        ]
        stage = f"{tmp}/probes_bp_stage{q}"
        spark.createDataFrame(
            rows, "user_id string, query_text string"
        ).coalesce(1).write.parquet(stage)
        part = next(
            f for f in os.listdir(stage) if f.endswith(".parquet")
        )
        os.rename(f"{stage}/{part}", f"{src}/batch{q:02d}.parquet")
    probes_stream = (
        spark.readStream.schema("user_id string, query_text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    server, url = SV.sse_http_server(
        drain_timeout_s=30.0, max_queue_events=max_queue_events
    )
    try:
        got: dict[str, list[str]] = {}
        drops: dict[str, int] = {}
        errs: list[str] = []

        def read(user: str) -> None:
            try:
                got[user], drops[user] = SV.read_sse_events(
                    url, user, timeout_s=600.0, with_markers=True
                )
            except Exception as exc:  # pragma: no cover — probe surface
                errs.append(f"{user}: {exc}")

        # LIVE readers attach BEFORE the push (user000 stays stalled).
        threads = [
            threading.Thread(target=read, args=(f"user{u:03d}",))
            for u in range(1, n_users)
        ]
        t0 = time.time()
        for t in threads:
            t.start()
        SV.serve_push_stream(
            probes_stream,
            chunks,
            SV.http_push_sink_factory(url),
            checkpoint=f"{tmp}/ckpt_bp",
            k=5,
        ).awaitTermination()
        push_wall = time.time() - t0
        for t in threads:
            t.join()
        total_wall = time.time() - t0
        assert not errs, errs[:3]

        per_user = n_queries * 5 * 3
        live_ok = sum(
            1
            for u, payloads in got.items()
            if len(payloads) == per_user
            and drops[u] == 0
            and [json.loads(p)["type"] for p in payloads]
            == ["create", "createLink", "addMessage"] * (n_queries * 5)
        )
        stalled = server.queue_stats().get("user000", {})
        # Now drain the stalled reader: expect the capped suffix + marker.
        s_payloads, s_dropped = SV.read_sse_events(
            url, "user000", timeout_s=60.0, with_markers=True
        )
        cycle = ["create", "createLink", "addMessage"]
        lost = per_user - max_queue_events
        suffix_ok = [json.loads(p)["type"] for p in s_payloads] == [
            cycle[(lost + i) % 3] for i in range(len(s_payloads))
        ]
        return {
            "n_users": n_users,
            "n_queries_per_user": n_queries,
            "max_queue_events": max_queue_events,
            "live_readers": n_users - 1,
            "live_order_and_lossless_ok": live_ok,
            "push_wall_s": round(push_wall, 2),
            "total_wall_s": round(total_wall, 2),
            "events_delivered_live": sum(len(v) for v in got.values()),
            "stalled_depth_at_cap": int(stalled.get("depth", -1)),
            "stalled_dropped_pending": int(stalled.get("dropped", -1)),
            "stalled_payloads": len(s_payloads),
            "stalled_dropped_marker": s_dropped,
            "stalled_suffix_order_ok": bool(suffix_ok),
        }
    finally:
        server.shutdown()


def probe_sse(spark, n_users: int, n_queries: int, tmp: str) -> dict:
    from pyspark.sql import functions as F

    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (  # noqa: E501
        pipeline as P,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (  # noqa: E501
        serve as SV,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.tables import (  # noqa: E501
        load_table,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    docs = load_table(spark, sf_dir, "documents")
    chunks, _ = P.ingest_documents(docs)
    chunks = chunks.cache()
    chunks.count()  # ingest paid up front — the probe times SERVING

    probes = [
        (f"user{u:03d}", f"query {q} spark vector shuffle join {u}")
        for u in range(n_users)
        for q in range(n_queries)
    ]
    src = f"{tmp}/probes_src"
    spark.createDataFrame(
        probes, "user_id string, query_text string"
    ).repartition(8).write.parquet(src)
    probes_stream = spark.readStream.schema(
        "user_id string, query_text string"
    ).parquet(src)

    server, url = SV.sse_http_server(drain_timeout_s=1.0)
    try:
        t0 = time.time()
        q = SV.serve_push_stream(
            probes_stream,
            chunks,
            SV.http_push_sink_factory(url),
            checkpoint=f"{tmp}/ckpt_sse",
            k=5,
        )
        q.awaitTermination()
        push_wall = time.time() - t0

        # N concurrent SSE readers (one thread per user — what a browser
        # fleet looks like to the gateway).
        import threading

        got: dict[str, list[str]] = {}
        errs: list[str] = []

        def read(user: str) -> None:
            try:
                got[user] = SV.read_sse_events(url, user, timeout_s=60.0)
            except Exception as exc:  # pragma: no cover — probe surface
                errs.append(f"{user}: {exc}")

        t1 = time.time()
        threads = [
            threading.Thread(target=read, args=(f"user{u:03d}",))
            for u in range(n_users)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        drain_wall = time.time() - t1

        assert not errs, errs[:3]
        n_events = sum(len(v) for v in got.values())
        order_ok = 0
        for user, payloads in got.items():
            # per-user contract: 3 event types per hit, ranks ascending
            types = [json.loads(p)["type"] for p in payloads]
            expected = ["create", "createLink", "addMessage"] * (
                len(payloads) // 3
            )
            if types == expected and len(payloads) == n_queries * 5 * 3:
                order_ok += 1
        return {
            "n_users": n_users,
            "n_queries_per_user": n_queries,
            "events_delivered": n_events,
            "users_order_ok": order_ok,
            "push_wall_s": round(push_wall, 2),
            "drain_wall_s": round(drain_wall, 2),
            "events_per_s_drain": round(n_events / drain_wall, 1),
        }
    finally:
        server.shutdown()


def probe_embed(spark, n_docs: int, tmp: str) -> dict:
    from pyspark.sql import functions as F

    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.functions import (  # noqa: E501
        embed as E,
    )

    # 10% of docs rate-limited twice each (429 -> 429 -> 200): the storm
    # adds 2 extra requests per marked doc.
    rows = [
        (
            i,
            (
                f"doc {i} <<TRANSIENT>> payload text"
                if i % 10 == 0
                else f"doc {i} payload text"
            ),
        )
        for i in range(n_docs)
    ]
    server, url = E.local_embedding_server(dim=64, fail_first=2)
    try:
        df = spark.createDataFrame(rows, "doc_id long, text string")
        n_parts = 8
        udf = E.retrying_embedder(
            E.http_transport(url, dim=64),
            max_attempts=3,
            backoff_s=0.0,       # the 429 is instant on loopback; the
            min_interval_s=0.02,  # reference's 20 ms pacing is the cost
        )
        t0 = time.time()
        out = (
            df.repartition(n_parts)
            .select("doc_id", udf(F.col("text")).alias("r"))
            .select("doc_id", "r.embedding", "r.attempts")
        )
        agg = out.selectExpr(
            "count(*) AS n",
            "sum(attempts) AS requests",
            "sum(CASE WHEN size(embedding) = 64 THEN 1 ELSE 0 END) AS ok",
        ).collect()[0]
        wall = time.time() - t0
        ceiling = n_parts / 0.02
        return {
            "n_docs": int(agg["n"]),
            "ok_docs": int(agg["ok"]),
            "requests": int(agg["requests"]),
            "workers": n_parts,
            "pacing_s": 0.02,
            "wall_s": round(wall, 2),
            "docs_per_s": round(agg["n"] / wall, 1),
            "req_per_s": round(agg["requests"] / wall, 1),
            "req_per_s_pacing_ceiling": ceiling,
            "ref_envelope_req_per_min_per_jvm": 1440,
        }
    finally:
        server.shutdown()


def main() -> None:
    import tempfile

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_users = int(args[0]) if args else 32
    n_docs = int(args[1]) if len(args) > 1 else 2000
    spark = get_spark(app_name="seam-probe")
    if "--backpressure" in sys.argv[1:]:
        # r12 form: N users, bounded queues (cap 32 < the 60-event
        # per-user total, >= the 15-event per-burst live load), one
        # stalled reader.
        with tempfile.TemporaryDirectory(prefix="seamprobe_") as tmp:
            bp = probe_sse_backpressure(spark, n_users, 4, tmp, 32)
        print(json.dumps({"sse_backpressure": bp}))
        return
    with tempfile.TemporaryDirectory(prefix="seamprobe_") as tmp:
        sse = probe_sse(spark, n_users, 4, tmp)
        emb = probe_embed(spark, n_docs, tmp)
    print(json.dumps({"sse_gateway": sse, "embed_transport": emb}))


if __name__ == "__main__":
    main()
