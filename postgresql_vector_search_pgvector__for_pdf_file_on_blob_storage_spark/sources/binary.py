"""Binary document source — the Spark analog of the reference's blob
container trigger (SURVEY.md §2A row 1).

Reference: ``@BlobTrigger(path = "pdfs/{name}") byte[] content``
(Function.java:71-79) delivers whole-file bytes per new object, filtered to
``.pdf`` (Function.java:83), then PDFBox extracts one text row per page
(Function.java:90-132).

Spark shape: ``binaryFile`` format gives ``(path, modificationTime, length,
content)`` with partition-parallel reads; the same source works batch
(``spark.read``) and incremental (``spark.readStream`` + checkpoint +
``Trigger.AvailableNow`` — see streaming.ingest).  Note Spark's binaryFile
cap: one file must fit in 2 GB (SURVEY.md §7.4 item 7).

PDF parsing: PDFBox is JVM-only; the Python-side extractor tries ``pypdf``
/ ``pdfminer`` and otherwise falls back to a deterministic FAKE format used
by tests (``%FAKEPDF`` header, pages separated by form-feed).  The Spark
plumbing — schema, ``mapInPandas`` batch shape, page explode — is identical
for real and fake parsers, so swapping in a real lib changes nothing
upstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FAKE_PDF_MAGIC = b"%FAKEPDF"

PAGES_SCHEMA = "fileName string, pageNumber int, text string"


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str = "*.pdf",
    stream: bool = False,
) -> DataFrame:
    """Batch or streaming scan of a directory of binary documents.

    ``pathGlobFilter`` mirrors the reference's blob-path scoping
    (``pdfs/{name}``); the ``.pdf`` suffix filter itself stays a separate
    explicit predicate (op row 7) so non-matching files are *visible* to the
    caller when they loosen the glob.
    """
    reader = spark.readStream if stream else spark.read
    return (
        reader.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def pdf_filter(df: DataFrame, col: str = "path") -> DataFrame:
    """``fileName.endsWith(".pdf")`` (Function.java:83) — non-PDFs are
    silently dropped, matching the reference."""
    return df.filter(F.col(col).endswith(".pdf"))


def _extract_pages_py(content: bytes) -> list[str]:
    """Whole-document -> per-page text, best available parser.

    Order: pypdf if installed (full-fidelity), then the bundled pure-stdlib
    simple-PDF parser (sources/minipdf — real ``%PDF-`` files: classic and
    1.5+ object-stream layouts, Flate/raw content streams, Type0/ToUnicode
    CMap text), then the ``%FAKEPDF`` test format.  Unknown/corrupt
    formats yield no pages (the reference logs & skips unparseable pages,
    Function.java:121-125).
    """
    if content is None:
        return []
    if content.startswith(FAKE_PDF_MAGIC):
        body = content[len(FAKE_PDF_MAGIC) :]
        return body.decode("utf-8", errors="replace").split("\f")
    try:  # pragma: no cover - pypdf absent in the build container
        import io

        from pypdf import PdfReader

        reader = PdfReader(io.BytesIO(content))
        return [(p.extract_text() or "") for p in reader.pages]
    except ImportError:
        pass
    except Exception:
        # Per-document parse errors must never fail the job (the reference
        # skips bad pages); emit zero pages for a corrupt file.
        return []
    try:
        from .minipdf import extract_text_pages

        pages = extract_text_pages(content)
        return pages if pages is not None else []
    except Exception:
        return []


def extract_pages(binary_df: DataFrame) -> DataFrame:
    """``(path, content)`` -> one row per page: ``(fileName, pageNumber,
    text)`` with 1-based page numbers (``IntStream.rangeClosed(1, ...)``,
    Function.java:100).

    ``mapInPandas``: Arrow-batched, one Python crossing per batch of files;
    each task parses its own files so extraction scales with the file count.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"fileName": [], "pageNumber": [], "text": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                name = path.rsplit("/", 1)[-1]
                for i, page in enumerate(_extract_pages_py(content), start=1):
                    out["fileName"].append(name)
                    out["pageNumber"].append(i)
                    out["text"].append(page)
            yield pd.DataFrame(out)

    return binary_df.select("path", "content").mapInPandas(gen, PAGES_SCHEMA)


def make_fake_pdf(pages: list[str]) -> bytes:
    """Build a ``%FAKEPDF`` fixture blob (used by tests and demos)."""
    return FAKE_PDF_MAGIC + "\f".join(pages).encode("utf-8")
