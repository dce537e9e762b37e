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
        clean, corrupt = TC.quarantine_corrupt(df)
        assert clean.count() == 20
        bad = [r[0] for r in corrupt.collect()]
        assert len(bad) == 2
        assert "not json at all" in bad
        # clean side keeps the declared schema, no corrupt column
        assert clean.columns == ["doc_id", "lang", "text"]
        assert clean.agg(F.sum("doc_id")).collect()[0][0] == sum(range(20))

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
