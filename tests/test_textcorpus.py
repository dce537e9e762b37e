"""JSONL corpus source + sharded parquet sink (sources/textcorpus.py)."""

from __future__ import annotations

import glob
import json
import os

import pyspark.sql.functions as F
import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.sources import (
    textcorpus as TC,
)

SCHEMA = "doc_id bigint, lang string, text string"


@pytest.fixture()
def jsonl_dir(tmp_path):
    lines = [
        json.dumps({"doc_id": i, "lang": "en", "text": f"doc {i} body"})
        for i in range(20)
    ]
    lines.insert(7, '{"doc_id": 99, "lang": "en", "text": "truncated')  # corrupt
    lines.insert(13, "not json at all")  # corrupt
    p = tmp_path / "shard-000.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(tmp_path)


class TestReadJsonl:
    def test_permissive_quarantines_corrupt_lines(self, spark, jsonl_dir):
        df = TC.read_jsonl_corpus(spark, jsonl_dir, SCHEMA)
        clean, corrupt, cached = TC.quarantine_corrupt(df)
        assert clean.count() == 20
        bad = [r[0] for r in corrupt.collect()]
        assert len(bad) == 2
        assert "not json at all" in bad
        # clean side keeps the declared schema, no corrupt column
        assert clean.columns == ["doc_id", "lang", "text"]
        assert clean.agg(F.sum("doc_id")).collect()[0][0] == sum(range(20))
        # caching contract: caller owns the cached parse and releases it
        assert cached.storageLevel.useMemory
        cached.unpersist()
        assert not cached.storageLevel.useMemory

    def test_dropmalformed_drops(self, spark, jsonl_dir):
        df = TC.read_jsonl_corpus(spark, jsonl_dir, SCHEMA, mode="DROPMALFORMED")
        assert df.count() == 20
        assert TC.CORRUPT_COL not in df.columns

    def test_failfast_raises(self, spark, jsonl_dir):
        df = TC.read_jsonl_corpus(spark, jsonl_dir, SCHEMA, mode="FAILFAST")
        with pytest.raises(Exception):
            df.collect()


class TestShardedParquet:
    def test_max_records_bounds_files_and_roundtrips(self, spark, tmp_path):
        df = spark.range(0, 10_000, 1, 4).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7).alias("bucket"),
        )
        out = str(tmp_path / "out")
        TC.write_sharded_parquet(df, out, max_records_per_file=1000)
        files = glob.glob(os.path.join(out, "*.parquet"))
        # 10k rows / 1k cap -> at least 10 files; every file <= cap
        assert len(files) >= 10
        back = spark.read.parquet(out)
        assert back.count() == 10_000
        assert back.agg(F.sum("doc_id")).collect()[0][0] == sum(range(10_000))
        import pyarrow.parquet as pq

        assert max(pq.ParquetFile(f).metadata.num_rows for f in files) <= 1000

    def test_partition_by_and_sort_within(self, spark, tmp_path):
        df = spark.range(0, 1000, 1, 4).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 3).cast("string").alias("lang"),
        )
        out = str(tmp_path / "parted")
        TC.write_sharded_parquet(
            df, out, partition_by=["lang"], sort_within=["doc_id"]
        )
        assert sorted(
            d for d in os.listdir(out) if d.startswith("lang=")
        ) == ["lang=0", "lang=1", "lang=2"]
        back = spark.read.parquet(out)
        assert back.count() == 1000
        # partition pruning applies on the partition column
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.plans import (
            explain as E,
        )

        pruned = back.filter(F.col("lang") == "1")
        assert pruned.count() == 333  # ids ≡ 1 (mod 3) in [0, 1000)
        plan = E.plan_string(pruned, "formatted")
        assert "PartitionFilters" in plan


class TestSynthDocsDataSource:
    """Spark 4 Python DataSource extension point (sources/synthdocs.py)."""

    @pytest.fixture(scope="class")
    def registered(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.sources import (
            synthdocs as SD,
        )

        SD.register(spark)
        return SD

    def test_reads_deterministically(self, spark, registered):
        df = (
            spark.read.format("synthdocs")
            .option("rows", 500)
            .option("partitions", 4)
            .load()
        )
        assert df.columns == ["doc_id", "lang", "text"]
        assert df.count() == 500
        a = df.orderBy("doc_id").limit(3).collect()
        b = (
            spark.read.format("synthdocs")
            .option("rows", 500)
            .option("partitions", 4)
            .load()
            .orderBy("doc_id")
            .limit(3)
            .collect()
        )
        assert a == b  # pure function of (seed, doc_id)
        # different seed -> different text
        c = (
            spark.read.format("synthdocs")
            .option("rows", 500)
            .option("seed", 7)
            .load()
            .orderBy("doc_id")
            .limit(3)
            .collect()
        )
        assert [r["text"] for r in a] != [r["text"] for r in c]

    def test_partition_parallel_scan(self, spark, registered):
        df = (
            spark.read.format("synthdocs")
            .option("rows", 1000)
            .option("partitions", 8)
            .load()
        )
        assert df.rdd.getNumPartitions() == 8
        # each doc_id appears exactly once across partitions (no overlap,
        # no gap at the ceil-division boundary)
        assert df.select("doc_id").distinct().count() == 1000

    def test_composes_with_engine_operators(self, spark, registered):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
            textstats as T,
        )

        df = spark.read.format("synthdocs").option("rows", 200).load()
        out = T.repetition_signals(df)
        assert out.count() == 200
        assert out.filter(F.col("n_tokens") != 30).count() == 0
