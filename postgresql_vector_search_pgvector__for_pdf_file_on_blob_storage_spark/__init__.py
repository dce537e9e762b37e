"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference system
(yoshioterada/PostgreSQL-Vector-Search-pgvector--for-PDF-file-on-Blob-Storage).

The reference is a PDF -> vector-search -> LLM-summarization (RAG) pipeline
on Azure (Java).  This package re-expresses every operator it implements —
plus the LLM-data-pipeline closure (dedup, similarity search, text analysis,
streaming ingest) — as idiomatic Spark DataFrame / SQL plans, designed so the
same code runs on a 1000-executor cluster against 100 TB:

- declarative plans (Catalyst does pushdown/pruning/join selection),
- native ``pyspark.sql.functions`` expressions in the hot path
  (whole-stage codegen; vector distances via ``zip_with``+``aggregate``),
- Arrow-batched pandas UDFs only where semantics require Python
  (PDF extraction, the reference's exact chunking algorithm, embedding),
- broadcast for probe/dimension tables, ``TakeOrderedAndProject`` for top-k,
- append-only event-log for ingest status (no in-place mutation).

See SURVEY.md at the repo root for the full operator inventory and the
file:line citations into /root/reference that each module's docstrings use.
"""

from .session import get_spark
from .tables import TABLES, load_table, register_views

__all__ = ["get_spark", "TABLES", "load_table", "register_views"]

__version__ = "0.1.0"
