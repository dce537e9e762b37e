"""Reference-parity scalar ops & listings (SURVEY.md §2A rows 7-12, 15-16, 25).

Mechanical split of the former single-file queries.py (round 9) — the
section bodies are verbatim; only relative-import depth changed.
"""

from __future__ import annotations

from ._core import *  # noqa: F401,F403


# ---------------------------------------------------------------------------
# Reference-parity scalar ops & listings (SURVEY.md §2A rows 7-12, 15-16, 25)
# ---------------------------------------------------------------------------


@query(
    "filter_suffix",
    """
SELECT doc_id, source, lang, n_chars FROM documents
WHERE source LIKE '%3' ORDER BY doc_id
""",
)
def filter_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix predicate — the reference's `.pdf` filter (Function.java:83)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("source").endswith("3"))
        .select("doc_id", "source", "lang", "n_chars")
        .orderBy("doc_id")
    )

@query(
    "listing_registered",
    """
SELECT doc_id, source, lang FROM documents
WHERE lang = 'en' ORDER BY source ASC, doc_id ASC
""",
)
def listing_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter + composite ASC sort — the Q4 'registered' listing
    shape (PDF-Summarizer/.../CosmosDBUtil.java:33)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("lang") == "en")
        .select("doc_id", "source", "lang")
        .orderBy(F.asc("source"), F.asc("doc_id"))
    )

@query(
    "listing_failed",
    """
SELECT doc_id, source, lang FROM documents
WHERE lang <> 'en' ORDER BY source ASC, doc_id ASC
""",
)
def listing_failed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inequality filter + composite sort — the Q5 'failed' listing shape
    (PDF-Summarizer/.../CosmosDBUtil.java:35)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("lang") != "en")
        .select("doc_id", "source", "lang")
        .orderBy(F.asc("source"), F.asc("doc_id"))
    )

@query(
    "normalize_whitespace",
    r"""
SELECT doc_id,
       regexp_replace(replace(text, chr(10), ' '), '\s{2,}', ' ', 'g') AS norm_text
FROM documents ORDER BY doc_id
""",
)
def normalize_whitespace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference normalizer (Function.java:106-107) as native exprs."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", X.normalize_text("text").alias("norm_text")
    ).orderBy("doc_id")

@query(
    "url_build",
    """
SELECT doc_id,
       'https://storage.example/pdfs/' || source || '#page=' || CAST(doc_id AS VARCHAR) AS url
FROM documents ORDER BY doc_id
""",
)
def url_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob-URL construction (SSEOpenAIController.java:204-206)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("https://storage.example/pdfs/"),
            F.col("source"),
            F.lit("#page="),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    ).orderBy("doc_id")
