"""minipdf: real-PDF parsing fidelity — classic and 1.5+ object-stream
layouts (the format every post-2005 writer emits), plus corrupt-input
behavior through the Spark extraction pipeline."""

from __future__ import annotations

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.sources import (
    binary as B,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.sources import (
    minipdf as MP,
)

PAGES = [["alpha line one", "alpha line two"], ["beta solo"]]


def test_classic_layout_roundtrip():
    pdf = MP.make_pdf(PAGES)
    assert pdf.startswith(b"%PDF-1.4")
    got = MP.extract_text_pages(pdf)
    assert got == ["alpha line one\nalpha line two", "beta solo"]


def test_objstm_layout_roundtrip():
    """PDF 1.5 layout: page dicts/catalog/font live inside a compressed
    /Type /ObjStm, indexed by a cross-reference stream."""
    pdf = MP.make_pdf_15(PAGES)
    assert pdf.startswith(b"%PDF-1.5")
    assert b"/ObjStm" in pdf and b"/XRef" in pdf
    assert b"xref\n0 " not in pdf  # no classic xref table
    # page dicts must NOT be findable as top-level objects — they only
    # exist inside the compressed object stream
    assert b"/Type /Page /Parent" not in pdf
    got = MP.extract_text_pages(pdf)
    assert got == ["alpha line one\nalpha line two", "beta solo"]


def test_objstm_and_classic_extract_identically():
    for pages in ([["x"]], [["a", "b"], ["c"], ["d d d"]]):
        assert MP.extract_text_pages(
            MP.make_pdf_15(pages)
        ) == MP.extract_text_pages(MP.make_pdf(pages))


def test_objstm_pdf_through_spark_pipeline(spark, tmp_path):
    """A 1.5-style file flows through the binary-ingest extraction path
    (the PDFBox-parity seam, Function.java:90-132)."""
    d = tmp_path / "pdfs15"
    d.mkdir()
    (d / "modern.pdf").write_bytes(MP.make_pdf_15(PAGES))
    pages = B.extract_pages(B.read_binary_dir(spark, str(d), glob="*.pdf"))
    rows = {
        (r["fileName"], r["pageNumber"]): r["text"] for r in pages.collect()
    }
    assert rows[("modern.pdf", 1)] == "alpha line one\nalpha line two"
    assert rows[("modern.pdf", 2)] == "beta solo"


def test_corrupt_objstm_falls_through():
    """A truncated/garbled object stream must not crash — the parser skips
    what it cannot decode (same contract as corrupt classic files)."""
    pdf = MP.make_pdf_15(PAGES)
    # garble the ObjStm payload (flip bytes after the dict) — zlib fails,
    # the ObjStm is skipped, no page dicts remain -> None
    idx = pdf.index(b"/ObjStm")
    sidx = pdf.index(b"stream\n", idx) + len(b"stream\n")
    garbled = pdf[:sidx] + b"\x00\x00\x00\x00" + pdf[sidx + 4 :]
    assert MP.extract_text_pages(garbled) is None
