"""BM25 / RRF fusion / decontamination (operators/ranking.py).

Pins the BM25 formula against a hand-computed example, the fusion
arithmetic, the decontamination counts, and the plan shapes (broadcasts on
the small sides, TakeOrderedAndProject for the ranking, no Python UDFs)."""

import math

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
    ranking as R,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.plans import (
    explain as E,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (
    queries as Q,
)


@pytest.fixture(scope="module")
def tiny_docs(spark):
    return spark.createDataFrame(
        [
            (0, "cat dog cat"),
            (1, "dog bird"),
            (2, "fish fish fish fish"),
        ],
        ["doc_id", "text"],
    )


def _bm25_expected(tf, df, dl, n_docs=3, avgdl=3.0, k1=1.2, b=0.75):
    idf = round(math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 6)
    tfp = (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl)))
    return idf * tfp


def test_bm25_hand_computed(spark, tiny_docs):
    got = {
        r["doc_id"]: r["score"]
        for r in R.bm25_scores(
            tiny_docs, "text", "doc_id", ["cat", "dog"]
        ).collect()
    }
    # doc 2 matches no term -> absent.
    assert set(got) == {0, 1}
    # N=3, avgdl=(3+2+4)/3=3.  doc0: cat tf=2 df=1, dog tf=1 df=2; dl=3.
    exp0 = _bm25_expected(2, 1, 3.0) + _bm25_expected(1, 2, 3.0)
    exp1 = _bm25_expected(1, 2, 2.0)
    assert got[0] == pytest.approx(exp0, abs=2e-6)
    assert got[1] == pytest.approx(exp1, abs=2e-6)
    # Ranking: doc0 carries the rarer term twice -> rank 1.
    ranked = R.bm25_search(tiny_docs, "text", "doc_id", ["cat", "dog"], k=2)
    rows = {r["doc_id"]: r["rank"] for r in ranked.collect()}
    assert rows == {0: 1, 1: 2}


def test_rrf_fuse_handles_missing_ranks(spark):
    a = spark.createDataFrame([(10, 1), (20, 2)], ["doc_id", "rank"])
    b = spark.createDataFrame([(20, 1), (30, 2)], ["doc_id", "rank"])
    out = {r["doc_id"]: r for r in R.rrf_fuse(a, b, "doc_id").collect()}
    assert out[20]["rrf_score"] == pytest.approx(1 / 62 + 1 / 61)
    assert out[10]["rrf_score"] == pytest.approx(1 / 61)
    assert out[10]["rank_b"] is None
    assert out[30]["rank_a"] is None
    # Doc ranked by both fuses highest.
    assert max(out.values(), key=lambda r: r["rrf_score"])["doc_id"] == 20


def test_decontaminate_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            # contains the benchmark 4-gram "alpha beta gamma delta"
            (0, "x alpha beta gamma delta y"),
            # same words, different order -> no shared 4-gram
            (1, "delta gamma beta alpha x y"),
            (2, "alpha beta gamma delta"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in R.decontaminate(train, bench, "text", "doc_id", n=4).collect()
    }
    assert set(out) == {0, 2}
    assert out[0]["n_shared"] == 1 and out[0]["n_grams"] == 3
    assert out[2]["contamination"] == pytest.approx(1.0)


def test_bm25_plan_shapes(spark, sf_dir):
    df = Q.QUERIES["bm25_keyword_search"](spark, sf_dir)
    assert E.has_broadcast_join(df)  # stats + dfreq travel as broadcasts
    assert E.has_take_ordered(df)  # bounded top-k, no global sort
    assert not E.python_eval_nodes(df)  # native expressions only
    # The query-term filter must sit below the (doc, term) aggregate so the
    # corpus token stream is never shuffled: in the optimized plan the
    # Filter node appears under (textually after) the score Aggregate,
    # directly above the explode Generate.
    plan = E.optimized_plan_string(df)
    filter_at = plan.index("IN (vector,hash,window,spark)")
    assert filter_at > plan.index("Aggregate [doc_id")
    assert "Generate explode" in plan[filter_at:]


def test_hybrid_and_decontamination_plans(spark, sf_dir):
    hy = Q.QUERIES["hybrid_rrf_search"](spark, sf_dir)
    assert E.has_take_ordered(hy)
    assert not E.python_eval_nodes(hy)
    de = Q.QUERIES["decontamination_overlap"](spark, sf_dir)
    assert E.has_broadcast_join(de)  # benchmark shingle set broadcast
    assert not E.python_eval_nodes(de)


def test_hybrid_rrf_agrees_with_sources(spark, sf_dir):
    rows = Q.QUERIES["hybrid_rrf_search"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        expect = 0.0
        if r["bm25_rank"] is not None:
            expect += 1.0 / (60.0 + r["bm25_rank"])
        if r["vec_rank"] is not None:
            expect += 1.0 / (60.0 + r["vec_rank"])
        assert r["rrf_score"] == pytest.approx(expect)
    # Descending fusion order.
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
