"""Custom Python DataSource (Spark 4 extension point): a deterministic
synthetic-document generator, ``spark.read.format("synthdocs")``.

The reference's ingestion begins at a custom connector (the Azure Blob
trigger, Function.java:71-79).  Spark 4's Python DataSource API is the
engine-native way to host such connectors without JVM code: implement
``DataSource`` + ``DataSourceReader``, register once per session, and the
source participates in normal planning — schema known up front, one task
per ``InputPartition``, columns pruned by Catalyst after the scan.

This instance generates corpus fixtures (load tests, demos) instead of
calling a cloud API, so it is fully deterministic: row content is a pure
function of (seed, doc_id), and the partition layout is explicit —
``rows`` split evenly across ``partitions`` input partitions, each read
independently on an executor.  The same class shape — partitions() +
read(partition) — is exactly what a real blob/HTTP connector implements.

Options: ``rows`` (default 1000), ``partitions`` (default 8),
``seed`` (default 42), ``words`` per document (default 30).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

LANGS = ("en", "de", "fr", "es", "zh")

SCHEMA = "doc_id bigint, lang string, text string"


def _words(seed: int, doc_id: int, n: int) -> str:
    """Deterministic pseudo-text: word j of doc i is a short token drawn
    from a 5000-word synthetic vocabulary by a stable hash."""
    out = []
    for j in range(n):
        h = hashlib.blake2b(
            f"{seed}:{doc_id}:{j}".encode(), digest_size=4
        ).digest()
        out.append(f"w{int.from_bytes(h, 'big') % 5000}")
    return " ".join(out)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.words = int(options.get("words", 30))

    def partitions(self):
        per = max(1, -(-self.rows // self.n_parts))  # ceil division
        return [
            _Range(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield (i, LANGS[i % len(LANGS)], _words(self.seed, i, self.words))


class SynthDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(self.options)


def register(spark) -> None:
    """Register the source on a session: afterwards
    ``spark.read.format("synthdocs").option("rows", N).load()`` works."""
    spark.dataSource.register(SynthDocsDataSource)
