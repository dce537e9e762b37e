"""Scale patterns: salted aggregation equivalence, bucketed co-located
joins (no exchange), and the summarization enrichment seam."""

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (
    pipeline as P,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
    skew as SK,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.plans import (
    explain as E,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.tables import (
    load_table,
)


def test_salted_count_equals_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    salted = {
        r["event_type"]: r["count"]
        for r in SK.salted_count(ev, ["event_type"], 8).collect()
    }
    assert salted == plain


def test_salted_sum_equals_plain(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    dec = F.col("l_quantity").cast("decimal(18,6)")
    plain = {
        r["l_returnflag"]: r["s"]
        for r in l.groupBy("l_returnflag").agg(F.sum(dec).alias("s")).collect()
    }
    salted = {
        r["l_returnflag"]: r["s"]
        for r in SK.salted_agg_sum(l, ["l_returnflag"], dec, "s", 8).collect()
    }
    assert salted == plain


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Pre-bucketing both sides on the join key removes the exchange — the
    co-located join layout a 100 TB fact-fact join needs (SURVEY.md §4.4).
    SortMergeJoin over bucketed tables must plan zero Exchange nodes."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, sf_dir, "orders")
        l = load_table(spark, sf_dir, "lineitem")
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).saveAsTable("orders_b")
        l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable("lineitem_b")
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).select(
            "l_orderkey", "o_totalprice", "l_quantity"
        )
        assert E.num_exchanges(joined) == 0, E.plan_string(joined, "executed")
        # and it still computes the right thing
        plain = (
            l.join(o, l.l_orderkey == o.o_orderkey).count()
        )
        assert joined.count() == plain
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_summaries_seam(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    chunks, _ = P.ingest_documents(docs, max_len=200)
    hits = P.search(chunks, "fox", k=3)
    out = P.summaries(hits, "what about the fox?").collect()
    assert len(out) == 3
    for r in out:
        assert r["origntext"] in r["prompt"]
        assert "what about the fox?" in r["prompt"]
        assert r["summary"].startswith("[re: what about the fox?]")


def test_summaries_custom_summarizer(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    chunks, _ = P.ingest_documents(docs, max_len=200)
    hits = P.search(chunks, "q", k=2)

    @F.pandas_udf("string")
    def shouty(text, q):
        return (text.str.slice(0, 10) + "!!").str.upper()

    out = P.summaries(hits, "q", summarizer=shouty).collect()
    for r in out:
        assert r["summary"].endswith("!!")
        assert r["summary"] == (r["origntext"][:10] + "!!").upper()
