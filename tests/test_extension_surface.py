"""UDF/UDAF/UDTF extension surface (SURVEY.md §2B B14) and typed-table DDL
with invariant enforcement (§2A row 31)."""

import math

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.functions import (
    udtf as U,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.sources import (
    catalog as C,
)


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    U.register_all(spark)


def test_scalar_pandas_udf(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("one",)], ["t"])
    got = [r["n"] for r in df.select(U.token_count_udf("t").alias("n")).collect()]
    assert got == [3, 0, 1]


def test_udaf_geometric_mean(spark):
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", 5.0), ("b", -1.0)], ["k", "v"]
    )
    got = {
        r["k"]: r["gm"]
        for r in df.groupBy("k").agg(U.geometric_mean_udaf("v").alias("gm")).collect()
    }
    assert got["a"] == pytest.approx(4.0)  # sqrt(2*8)
    assert got["b"] == pytest.approx(5.0)  # negatives excluded


def test_udtf_chunk_text_sql(spark):
    rows = spark.sql(
        "SELECT * FROM chunk_text('aaaa.bbb', 5, 2)"
    ).collect()
    got = [(r["chunk_idx"], r["chunk"]) for r in rows]
    # len 8 > 5: scan i in (3,5] for punct: '.' at i=4 -> 'aaaa' + '.bbb'
    assert got == [(0, "aaaa"), (1, ".bbb")]


def test_udaf_in_sql(spark):
    spark.createDataFrame([(1.0,), (4.0,), (16.0,)], ["v"]).createOrReplaceTempView(
        "gm_in"
    )
    r = spark.sql("SELECT geometric_mean(v) AS gm FROM gm_in").first()
    assert r["gm"] == pytest.approx(4.0)


def test_create_and_validate_chunks_table(spark, tmp_path):
    C.create_chunks_table(spark, "chunks_t", str(tmp_path / "chunks_t"))
    try:
        ok = spark.createDataFrame(
            [("id1", [0.1, 0.2], "t", "f.pdf", 1), ("id2", [0.3, 0.4], "u", "f.pdf", 2)],
            "id string, embedding array<float>, origntext string, fileName string, pageNumber int",
        )
        C.append_chunks(ok, "chunks_t", dim=2)
        assert spark.table("chunks_t").count() == 2

        bad_dim = spark.createDataFrame(
            [("id3", [0.1], "t", "f.pdf", 1)], ok.schema
        )
        with pytest.raises(ValueError, match="VECTOR"):
            C.append_chunks(bad_dim, "chunks_t", dim=2)

        dup = spark.createDataFrame(
            [("idX", [0.1, 0.2], "t", "f.pdf", 1), ("idX", [0.3, 0.4], "u", "g.pdf", 2)],
            ok.schema,
        )
        with pytest.raises(ValueError, match="primary-key"):
            C.append_chunks(dup, "chunks_t", dim=2)
        # failed appends must not have written anything
        assert spark.table("chunks_t").count() == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS chunks_t")


def test_url_encode_spark_side(spark):
    """op row 22 (Function.java:80-81): URL-encoding; DuckDB has no twin so
    escaping is pinned here instead of in the oracle suite."""
    df = spark.createDataFrame([("a b/c?d=e&f",)], ["s"])
    got = df.select(F.url_encode("s").alias("e")).first()["e"]
    assert got == "a+b%2Fc%3Fd%3De%26f"


def test_udtf_lateral_row_count_matches_chunk_explode(spark, sf_dir):
    """The UDTF lateral-join chunker and the explode-based chunker must
    produce identical (doc_id, chunk_idx) universes on the fixture corpus
    — the cross-check that backs folding both into the driver's combined
    chunking_gallery rows-only entry (driver_registry.ROWS_ONLY_SUITES)."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (
        queries as Q,
    )

    explode_keys = {
        (r["doc_id"], r["chunk_idx"])
        for r in Q.QUERIES["chunk_explode"](spark, sf_dir)
        .select("doc_id", "chunk_idx")
        .collect()
    }
    udtf_keys = {
        (r["doc_id"], r["chunk_idx"])
        for r in Q.QUERIES["udtf_chunk_lateral"](spark, sf_dir)
        .select("doc_id", "chunk_idx")
        .collect()
    }
    assert explode_keys == udtf_keys
    assert len(explode_keys) > 0
