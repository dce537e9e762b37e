"""minipdf: real-PDF parsing fidelity — classic and 1.5+ object-stream
layouts (the format every post-2005 writer emits), CID-keyed Type0 fonts
with /ToUnicode CMaps (the CJK/Unicode layout), plus corrupt-input
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


JP_PAGES = [
    ["ベクトル検索は楽しい", "PostgreSQL + pgvector 入門"],
    ["2ページ目: English mixed 行"],
]


def test_cid_tounicode_roundtrip():
    """Type0/Identity-H text (the CJK layout PDFBox handles for the
    reference's Japanese PDFs, Function.java:90-132) round-trips through
    the /ToUnicode CMap: CIDs are assigned sequentially, so a correct
    extraction proves the bfchar mapping was actually consulted."""
    pdf = MP.make_pdf_cid(JP_PAGES)
    assert b"/Identity-H" in pdf and b"/ToUnicode" in pdf
    got = MP.extract_text_pages(pdf)
    assert got == ["\n".join(p) for p in JP_PAGES]


def test_cid_ascii_not_identity():
    """ASCII through the CID writer must still decode via the CMap — the
    sequential CID assignment means code 1 is 'h', not chr(1)."""
    pdf = MP.make_pdf_cid([["hello"]])
    assert MP.extract_text_pages(pdf) == ["hello"]


def test_bfchar_and_bfrange_forms():
    cmap = MP._parse_tounicode(
        b"2 beginbfrange\n"
        b"<0041> <0043> <0061>\n"          # scalar base: A..C -> a..c
        b"<0050> <0051> [<0058> <0059>]\n"  # array form: P,Q -> X,Y
        b"endbfrange\n"
        b"1 beginbfchar\n<0001> <30C6>\nendbfchar\n"
    )
    assert cmap[0x41] == "a" and cmap[0x42] == "b" and cmap[0x43] == "c"
    assert cmap[0x50] == "X" and cmap[0x51] == "Y"
    assert cmap[0x01] == "テ"


def test_bfchar_surrogate_pair_destination():
    """A destination outside the BMP is UTF-16BE with a surrogate pair."""
    pdf = MP.make_pdf_cid([["math 𝕏 symbol"]])
    assert MP.extract_text_pages(pdf) == ["math 𝕏 symbol"]


def test_cid_pdf_through_spark_pipeline(spark, tmp_path):
    """A CID-keyed Japanese PDF flows through the binary-ingest extraction
    path end-to-end."""
    d = tmp_path / "pdfs_cid"
    d.mkdir()
    (d / "jp.pdf").write_bytes(MP.make_pdf_cid(JP_PAGES))
    pages = B.extract_pages(B.read_binary_dir(spark, str(d), glob="*.pdf"))
    rows = {
        (r["fileName"], r["pageNumber"]): r["text"] for r in pages.collect()
    }
    assert rows[("jp.pdf", 1)] == "\n".join(JP_PAGES[0])
    assert rows[("jp.pdf", 2)] == "\n".join(JP_PAGES[1])


def test_classic_fixture_unaffected_by_font_machinery():
    """Simple-font classic files keep byte-identical latin-1 decoding (the
    pre-CMap behavior) — the Type1 font has no ToUnicode stream."""
    pdf = MP.make_pdf(PAGES)
    assert MP.extract_text_pages(pdf) == [
        "alpha line one\nalpha line two",
        "beta solo",
    ]


def test_rc4_encrypted_roundtrip():
    """An RC4-encrypted file (Standard handler, empty user password — the
    real-world 'restricted' shape) decrypts transparently; the plaintext
    never appears in the file bytes."""
    import zlib

    pdf = MP.make_pdf_encrypted(PAGES)
    assert b"/Encrypt" in pdf and b"/Standard" in pdf
    plain_stream = zlib.compress(
        b"BT /F1 12 Tf 72 720 Td\n(alpha line one) Tj\n0 -14 Td\n"
        b"(alpha line two) Tj\nET"
    )
    assert plain_stream not in pdf
    assert MP.extract_text_pages(pdf) == [
        "alpha line one\nalpha line two",
        "beta solo",
    ]


def test_rc4_encrypted_through_spark_pipeline(spark, tmp_path):
    d = tmp_path / "pdfs_enc"
    d.mkdir()
    (d / "locked.pdf").write_bytes(MP.make_pdf_encrypted(PAGES))
    pages = B.extract_pages(B.read_binary_dir(spark, str(d), glob="*.pdf"))
    rows = {
        (r["fileName"], r["pageNumber"]): r["text"] for r in pages.collect()
    }
    assert rows[("locked.pdf", 1)] == "alpha line one\nalpha line two"


def test_aesv2_encrypted_roundtrip():
    """AES-128 (/AESV2, the Acrobat 7+ default) decrypts transparently:
    per-object sAlT-derived keys, IV-prefixed CBC payloads."""
    pdf = MP.make_pdf_encrypted(PAGES, scheme="aesv2")
    assert b"/AESV2" in pdf
    assert MP.extract_text_pages(pdf) == [
        "alpha line one\nalpha line two",
        "beta solo",
    ]


def test_aesv3_encrypted_roundtrip():
    """AES-256 (/AESV3, PDF 2.0): the file key unwraps from /UE via the
    Algorithm 2.B hardened hash with the empty user password."""
    pdf = MP.make_pdf_encrypted(PAGES, scheme="aesv3")
    assert b"/AESV3" in pdf and b"/UE" in pdf
    assert MP.extract_text_pages(pdf) == [
        "alpha line one\nalpha line two",
        "beta solo",
    ]


def test_aes_fips_vectors():
    """The bundled AES pins the FIPS-197 Appendix C vectors."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.sources import (
        tinyaes,
    )

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    k128 = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    k256 = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f"
        "101112131415161718191a1b1c1d1e1f"
    )
    assert (
        tinyaes._encrypt_block(pt, tinyaes._expand_key(k128)).hex()
        == "69c4e0d86a7b0430d8cdb78070b4c55a"
    )
    assert (
        tinyaes._encrypt_block(pt, tinyaes._expand_key(k256)).hex()
        == "8ea2b7ca516745bfeafc49904b496089"
    )
    iv = bytes(range(16))
    for msg in (b"", b"x", b"0123456789abcdef" * 3 + b"tail"):
        ct = tinyaes.cbc_encrypt(k256, iv, msg)
        assert tinyaes.cbc_decrypt(k256, iv, ct) == msg


def test_malformed_v4_falls_through():
    """A V=4 dict with no recognizable crypt filter yields no pages."""
    pdf = MP.make_pdf_encrypted(PAGES).replace(b"/V 2", b"/V 4")
    assert MP.extract_text_pages(pdf) is None


def test_aesv3_real_user_password_falls_through():
    """A tampered /U validation hash means the empty user password does
    not validate — the parser must refuse, not emit garbage."""
    pdf = MP.make_pdf_encrypted(PAGES, scheme="aesv3")
    i = pdf.index(b"/U <") + len(b"/U <")
    bad = pdf[:i] + b"00000000" + pdf[i + 8 :]
    assert MP.extract_text_pages(bad) is None


def test_wrong_key_does_not_crash():
    """A tampered /O entry derives a wrong key; decryption produces
    garbage that zlib rejects -> no pages, no exception."""
    pdf = MP.make_pdf_encrypted(PAGES)
    i = pdf.index(b"/O <") + len(b"/O <")
    garbled = pdf[:i] + b"00000000" + pdf[i + 8 :]
    out = MP.extract_text_pages(garbled)
    assert out is None or all("alpha" not in p for p in out)


def _predicted_pdf(parms: bytes, payload: bytes) -> bytes:
    """A minimal classic PDF whose content stream carries /DecodeParms."""
    head = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
    )
    obj4 = (
        b"4 0 obj\n<< /Length " + str(len(payload)).encode()
        + b" /Filter /FlateDecode /DecodeParms << " + parms
        + b" >> >>\nstream\n" + payload + b"\nendstream\nendobj\n"
    )
    return head + obj4 + b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"


def test_flate_predictors_decode():
    """PNG (Up/Sub/Average/Paeth per-row filters) and TIFF predictors on
    Flate streams decode to the original content (PDF 32000-1 §7.4.4.4)."""
    import zlib

    ops = b"BT /F1 12 Tf 72 720 Td\n(predicted text) Tj\nET"
    cols = 16
    padded = ops + b"\x00" * ((-len(ops)) % cols)
    rows = [padded[i : i + cols] for i in range(0, len(padded), cols)]

    # PNG, one filter type per row cycling Sub/Average/Paeth/None.
    enc = bytearray()
    prev = bytes(cols)
    for ri, row in enumerate(rows):
        ft = (1, 3, 4, 0)[ri % 4]
        enc.append(ft)
        for i in range(cols):
            left = row[i - 1] if i else 0
            up = prev[i]
            ul = prev[i - 1] if i else 0
            if ft == 0:
                v = row[i]
            elif ft == 1:
                v = row[i] - left
            elif ft == 3:
                v = row[i] - (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = (
                    left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                )
                v = row[i] - pred
            enc.append(v & 0xFF)
        prev = row
    pdf = _predicted_pdf(
        b"/Predictor 15 /Columns 16", zlib.compress(bytes(enc))
    )
    assert MP.extract_text_pages(pdf) == ["predicted text"]

    # TIFF horizontal differencing (Predictor 2).
    enc2 = bytearray(padded)
    for r0 in range(0, len(enc2), cols):
        row = bytes(enc2[r0 : r0 + cols])
        for i in range(cols - 1, 0, -1):
            enc2[r0 + i] = (row[i] - row[i - 1]) & 0xFF
    pdf2 = _predicted_pdf(
        b"/Predictor 2 /Columns 16", zlib.compress(bytes(enc2))
    )
    assert MP.extract_text_pages(pdf2) == ["predicted text"]


def test_predictor_bad_geometry_falls_through():
    """A payload whose length does not divide into (Columns+1) rows must
    yield no pages, not garbage."""
    import zlib

    pdf = _predicted_pdf(
        b"/Predictor 12 /Columns 1000", zlib.compress(b"\x02short")
    )
    # The page object parses; its content stream is unreadable -> empty
    # text, never garbage.
    assert MP.extract_text_pages(pdf) in (None, [""])


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


# ---------------------------------------------------------------------------
# Simple-font /Encoding (WinAnsi / MacRoman / Differences) — fonts WITHOUT
# /ToUnicode, the most common remaining real-PDF text shape (VERDICT r03
# next-round #8).
# ---------------------------------------------------------------------------


def test_winansi_roundtrip():
    text = 'café crème — “quotes” • naïve €99'
    pdf = MP.make_pdf_encoded([[text]], base="WinAnsiEncoding")
    assert b"/Encoding /WinAnsiEncoding" in pdf
    assert MP.extract_text_pages(pdf) == [text]


def test_winansi_differs_from_latin1_fallback():
    """The euro sign sits at 0x80 in WinAnsi; a latin-1 read would yield
    the C1 control \\x80 — proves the encoding is actually applied."""
    pdf = MP.make_pdf_encoded([["price: €5"]], base="WinAnsiEncoding")
    assert MP.extract_text_pages(pdf) == ["price: €5"]


def test_macroman_roundtrip():
    text = "Grüße von München"
    pdf = MP.make_pdf_encoded([[text]], base="MacRomanEncoding")
    # ü is 0x9F in MacRoman but 0xFC in latin-1/WinAnsi
    assert MP.extract_text_pages(pdf) == [text]


def test_differences_overlay():
    """/Differences remaps codes on top of the base encoding."""
    diffs = {136: "bullet", 137: "emdash", 138: "uni0394"}
    text = "a • b — Δ"
    pdf = MP.make_pdf_encoded(
        [[text]], base="WinAnsiEncoding", differences=diffs
    )
    assert b"/Differences [ 136 /bullet 137 /emdash 138 /uni0394 ]" in pdf
    assert MP.extract_text_pages(pdf) == [text]


def test_differences_without_base_encoding():
    pdf = MP.make_pdf_encoded(
        [["x † y"]], base=None, differences={200: "dagger"}
    )
    assert b"/BaseEncoding" not in pdf
    assert MP.extract_text_pages(pdf) == ["x † y"]


def test_unknown_glyph_name_keeps_code():
    """An unrecognized /Differences glyph name falls through to the base
    meaning instead of corrupting neighbors (code counter still
    advances)."""
    body = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " \
           b"/Encoding << /BaseEncoding /WinAnsiEncoding " \
           b"/Differences [ 65 /notarealglyphname /B ] >> >>"
    enc = MP._parse_encoding(body, {})
    assert enc[65] == "A"      # unknown name -> base meaning kept
    assert enc[66] == "B"      # counter advanced past the unknown name


def test_encoded_pdf_through_spark_pipeline(spark, tmp_path):
    d = tmp_path / "pdfs_enc"
    d.mkdir()
    (d / "winansi.pdf").write_bytes(
        MP.make_pdf_encoded([["résumé — €12"]], base="WinAnsiEncoding")
    )
    pages = B.extract_pages(B.read_binary_dir(spark, str(d), glob="*.pdf"))
    rows = {r["pageNumber"]: r["text"] for r in pages.collect()}
    assert rows[1] == "résumé — €12"


def test_classic_fixture_unaffected_by_encoding_machinery():
    assert MP.extract_text_pages(MP.make_pdf(PAGES)) == [
        "alpha line one\nalpha line two",
        "beta solo",
    ]


# ---------------------------------------------------------------------------
# Non-empty passwords (VERDICT r03 "what's missing" #2): user and owner
# password authentication across all three schemes.
# ---------------------------------------------------------------------------


def test_user_password_all_schemes():
    for scheme in ("rc4", "aesv2", "aesv3"):
        pdf = MP.make_pdf_encrypted(
            PAGES, scheme=scheme, user_pw=b"s3cret"
        )
        # without the password: unreadable, same contract as corrupt files
        assert MP.extract_text_pages(pdf) is None, scheme
        assert MP.extract_text_pages(pdf, password=b"wrong") is None, scheme
        got = MP.extract_text_pages(pdf, password=b"s3cret")
        assert got == ["alpha line one\nalpha line two", "beta solo"], scheme


def test_owner_password_opens_user_protected_file():
    """The owner password must also authenticate (Algorithm 7 for
    RC4/AESV2; the /OE route for AESV3) and yield the same file key."""
    for scheme in ("rc4", "aesv2", "aesv3"):
        pdf = MP.make_pdf_encrypted(
            PAGES, owner_pw=b"boss", scheme=scheme, user_pw=b"s3cret"
        )
        got = MP.extract_text_pages(pdf, password=b"boss")
        assert got == ["alpha line one\nalpha line two", "beta solo"], scheme


def test_empty_password_files_still_open_with_any_password_arg():
    """Files in the common restricted shape (empty USER password) must
    open regardless of a supplied password — the empty candidate is
    always tried."""
    for scheme in ("rc4", "aesv2", "aesv3"):
        pdf = MP.make_pdf_encrypted(PAGES, scheme=scheme)
        assert MP.extract_text_pages(pdf) is not None, scheme
        assert MP.extract_text_pages(pdf, password=b"whatever") is not None, scheme


# --- embedded-font glyph mapping (Type0 without /ToUnicode) ---------------


def test_type0_embedded_cmap_roundtrip():
    """A Type0/Identity-H PDF with NO /ToUnicode recovers its text from
    the embedded TrueType's (3,1) cmap; glyph ids start at 3, so the
    identity fallback would produce control characters, not this."""
    pdf = MP.make_pdf_type0_embedded(PAGES)
    assert b"/ToUnicode" not in pdf and b"/FontFile2" in pdf
    got = MP.extract_text_pages(pdf)
    assert got == ["alpha line one\nalpha line two", "beta solo"]


def test_type0_embedded_cmap_non_latin():
    """Multi-segment format-4 coverage: non-contiguous code points (ASCII
    + accents + CJK) force several cmap segments."""
    pages = [["mañana 中文 text", "déjà vu"]]
    pdf = MP.make_pdf_type0_embedded(pages)
    assert MP.extract_text_pages(pdf) == ["mañana 中文 text\ndéjà vu"]


def test_sfnt_cmap_formats_parse():
    """_parse_cmap_subtable handles formats 0, 6 and 12 alongside the
    format-4 table the fixture emits."""
    # format 6: firstCode=65, glyphs 10,11,12
    sub6 = (
        (6).to_bytes(2, "big") + (16).to_bytes(2, "big")
        + (0).to_bytes(2, "big") + (65).to_bytes(2, "big")
        + (3).to_bytes(2, "big")
        + b"".join(g.to_bytes(2, "big") for g in (10, 11, 12))
    )
    assert MP._parse_cmap_subtable(sub6) == {65: 10, 66: 11, 67: 12}
    # format 0: byte table
    table = bytearray(256)
    table[65] = 7
    sub0 = (0).to_bytes(2, "big") + (262).to_bytes(2, "big") \
        + (0).to_bytes(2, "big") + bytes(table)
    assert MP._parse_cmap_subtable(sub0) == {65: 7}
    # format 12: one group, U+1F600..U+1F602 -> 40..42
    sub12 = (
        (12).to_bytes(2, "big") + (0).to_bytes(2, "big")
        + (28).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + (1).to_bytes(4, "big")
        + (0x1F600).to_bytes(4, "big") + (0x1F602).to_bytes(4, "big")
        + (40).to_bytes(4, "big")
    )
    assert MP._parse_cmap_subtable(sub12) == {
        0x1F600: 40, 0x1F601: 41, 0x1F602: 42
    }


def test_type0_embedded_corrupt_font_falls_back():
    """A truncated/garbage font program must not crash — decoding falls
    back to per-code identity exactly as before this feature."""
    pdf = MP.make_pdf_type0_embedded([["hi"]])
    import re as _re
    import zlib as _z

    # replace the FontFile2 stream payload with garbage of equal length
    m = _re.search(rb"/Length1 \d+ >>\nstream\n(.*?)\nendstream", pdf, _re.S)
    assert m
    garbage = _z.compress(b"\x00\x01" * 8)
    bad = pdf[: m.start(1)] + garbage + pdf[m.end(1) :]
    bad = bad.replace(
        b"/Length %d " % len(m.group(1)), b"/Length %d " % len(garbage), 1
    )
    got = MP.extract_text_pages(bad)
    assert got is not None  # parsed, fallback decoding
    # ToUnicode stays authoritative when both are present
    good = MP.make_pdf_cid(PAGES)
    assert MP.extract_text_pages(good) == [
        "alpha line one\nalpha line two",
        "beta solo",
    ]


def test_type0_malformed_tounicode_falls_back_to_embedded_cmap():
    """A ToUnicode stream that parses to NOTHING (garbage CMap body) must
    not block the embedded-font recovery path."""
    import re as _re
    import zlib as _z

    pdf = MP.make_pdf_type0_embedded(PAGES)
    # graft a garbage ToUnicode stream as a new object referenced by the
    # Type0 font dict
    n_objs = len(_re.findall(rb"\d+ 0 obj", pdf))
    tu_num = n_objs + 1
    garbage = _z.compress(b"not a cmap at all")
    tu_obj = (
        b"%d 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
        % (tu_num, len(garbage))
        + garbage
        + b"\nendstream\nendobj\n"
    )
    pdf2 = pdf.replace(
        b"/Encoding /Identity-H",
        b"/Encoding /Identity-H /ToUnicode %d 0 R" % tu_num,
        1,
    )
    # append the object before xref (object scan ignores xref tables)
    pdf2 = pdf2.replace(b"xref\n", tu_obj + b"xref\n", 1)
    got = MP.extract_text_pages(pdf2)
    assert got == ["alpha line one\nalpha line two", "beta solo"]


# --- bare-CFF charset fallback (simple /Type1C without /Encoding) ---------


def test_cff_simple_roundtrip():
    """A simple font whose ONLY route back to text is the embedded bare
    CFF's Encoding + charset: no /ToUnicode, no /Encoding, byte codes
    assigned from 128 so the latin-1 fall-through would yield accented
    garbage."""
    pdf = MP.make_pdf_cff_simple(PAGES)
    assert b"/ToUnicode" not in pdf and b"/Encoding" not in pdf
    assert b"/FontFile3" in pdf
    assert MP.extract_text_pages(pdf) == [
        "alpha line one\nalpha line two",
        "beta solo",
    ]


def test_cff_simple_custom_strings():
    """Non-ASCII glyphs resolve through CUSTOM strings (SID >= 391,
    uniXXXX names) alongside standard-SID letters."""
    pages = [["café déjà — naïve"]]
    assert MP.extract_text_pages(MP.make_pdf_cff_simple(pages)) == [
        "café déjà — naïve"
    ]


def test_cff_corrupt_font_falls_back():
    """A truncated/garbage Type1C program must not crash — decoding
    falls back to latin-1 exactly as before this feature."""
    import re as _re
    import zlib as _z

    pdf = MP.make_pdf_cff_simple([["hi"]])
    m = _re.search(
        rb"/Subtype /Type1C >>\nstream\n(.*?)\nendstream", pdf, _re.S
    )
    assert m
    garbage = _z.compress(b"\xff\xfe" * 8)
    bad = pdf[: m.start(1)] + garbage + pdf[m.end(1) :]
    bad = bad.replace(
        b"/Length %d " % len(m.group(1)), b"/Length %d " % len(garbage), 1
    )
    got = MP.extract_text_pages(bad)
    assert got is not None  # parsed; fallback (garbled) decoding


def test_cff_pdf_side_encoding_keeps_precedence():
    """When the font dict DOES carry /Encoding, it wins over the CFF's
    built-in encoding (PDF 32000-1 §9.6.6) — the fallback only fills the
    no-Encoding gap."""
    pdf = MP.make_pdf_cff_simple([["AB"]])
    # graft an explicit /Encoding with /Differences remapping the two
    # fixture codes (128, 129) to swapped glyph names
    pdf2 = pdf.replace(
        b"/BaseFont /MiniCFF /FontDescriptor",
        b"/BaseFont /MiniCFF /Encoding << /Differences [128 /B /A] >>"
        b" /FontDescriptor",
        1,
    )
    assert MP.extract_text_pages(pdf2) == ["BA"]


def test_cff_charset_and_encoding_range_formats():
    """Range-coded charset (format 1/2) and Encoding (format 1) parse to
    the same maps as the array forms."""
    # (offsets 0/1/2 are the predefined-charset sentinels, so the
    # synthetic tables are padded to start at a real offset)
    pad = b"\x00\x00\x00"
    # charset format 1: gid 1..4 -> SIDs 34,35,36,37 (A,B,C,D)
    cs1 = pad + b"\x01" + (34).to_bytes(2, "big") + b"\x03"
    assert MP._cff_charset_sids(cs1, 3, 5) == [0, 34, 35, 36, 37]
    cs2 = pad + b"\x02" + (66).to_bytes(2, "big") + (1).to_bytes(2, "big")
    assert MP._cff_charset_sids(cs2, 3, 3) == [0, 66, 67]
    # encoding format 1: codes 40..42 -> gids 1..3
    enc1 = pad + b"\x01\x01" + bytes([40, 2])
    assert MP._cff_encoding_codes(enc1, 3) == {40: 1, 41: 2, 42: 3}
    # predefined encodings are left to the existing fall-through
    assert MP._cff_encoding_codes(b"", 0) is None
    assert MP._cff_encoding_codes(b"", 1) is None


def test_cff_maps_rejects_cid_keyed_and_garbage():
    """CID-keyed CFFs (ROS in the Top DICT) and malformed programs map
    to None — identity fallback unchanged."""
    assert MP._cff_maps(b"") is None
    assert MP._cff_maps(b"\x02\x00\x04\x01" + b"\x00" * 32) is None
    # build a valid name-keyed CFF, then rewrite its Top DICT to carry
    # ROS (12 30): operands 391 391 0 + escape op
    good = MP._make_cff(["A"], [65])
    maps = MP._cff_maps(good)
    assert maps is not None and maps[0][1] == "A" and maps[1][65] == "A"
    ros_op = (
        b"\x1d" + (391).to_bytes(4, "big")
        + b"\x1d" + (391).to_bytes(4, "big")
        + b"\x1d" + (0).to_bytes(4, "big")
    )
    # swap the 18-byte dict body for ROS operands + escape operator
    # (12 30) + a CharStrings op so the length stays parseable
    top_start = good.index(b"\x00\x01\x01") + 5
    cid_dict = ros_op[:13] + b"\x0c\x1e" + b"\x1d" + good[
        top_start + 13 : top_start + 17
    ]
    assert len(cid_dict) == 20
    bad = bytearray(good)
    bad[good.index(b"\x00\x01\x01") : top_start + 18] = (
        b"\x00\x01\x01" + bytes([1, 21]) + cid_dict
    )
    assert MP._cff_maps(bytes(bad)) is None


def test_cff_pdf_through_spark_pipeline(spark, tmp_path):
    d = tmp_path / "pdfs_cff"
    d.mkdir()
    (d / "t1c.pdf").write_bytes(MP.make_pdf_cff_simple([["type1c text"]]))
    pages = B.extract_pages(B.read_binary_dir(spark, str(d), glob="*.pdf"))
    rows = {r["pageNumber"]: r["text"] for r in pages.collect()}
    assert rows[1] == "type1c text"


def test_type3_font_decodes_via_differences():
    """Type3 fonts carry a MANDATORY /Encoding with /Differences (PDF
    32000-1 §9.6.4) mapping codes to glyph names; the simple-font
    /Encoding machinery decodes them with no Type3-specific code — this
    pin proves the claim with glyph procs present and codes deliberately
    not equal to character codes."""
    import zlib as _z

    text = "Type3 works"
    chars = sorted(set(text))
    code_of = {ch: 64 + i for i, ch in enumerate(chars)}
    rev = {}
    for nm, ch in MP._GLYPH_NAMES.items():
        rev.setdefault(ch, nm)
    diffs = b" ".join(
        b"%d /%s" % (
            code_of[ch],
            (rev.get(ch) or "uni%04X" % ord(ch)).encode(),
        )
        for ch in chars
    )
    glyph_proc = _z.compress(b"0 0 d0")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [5 0 R] /Count 1 >>",
        b"<< /Type /Font /Subtype /Type3 /FontBBox [0 0 10 10] "
        b"/FontMatrix [0.01 0 0 0.01 0 0] /CharProcs 4 0 R "
        b"/Encoding << /Type /Encoding /Differences [" + diffs + b"] >> "
        b"/FirstChar 64 /LastChar 90 >>",
        b"<< /g1 7 0 R >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 3 0 R >> >> /Contents 6 0 R >>",
        None,  # content, filled below
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(glyph_proc)
        + glyph_proc
        + b"\nendstream",
    ]
    ops = b"BT /F1 12 Tf 72 720 Td <" + b"".join(
        b"%02X" % code_of[ch] for ch in text
    ) + b"> Tj ET"
    data = _z.compress(ops)
    objs[5] = (
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(data)
        + data
        + b"\nendstream"
    )
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % n + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1) + b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    assert MP.extract_text_pages(bytes(out)) == [text]


def test_cff_present_but_tableless_encoding_blocks_fallback():
    """ADVICE r7: an /Encoding that is PRESENT but resolves to no table
    (bare /StandardEncoding, or /Differences whose glyph names are all
    unknown) keeps PDF-side precedence (PDF 32000-1 §9.6.6) — the
    CFF-internal encoding must NOT silently override it.  The decode
    then falls to latin-1/chr (StandardEncoding's ASCII-core behavior):
    the fixture's codes 128/129 yield those code points, not the CFF's
    remapped letters."""
    pdf = MP.make_pdf_cff_simple([["AB"]])
    with_std = pdf.replace(
        b"/BaseFont /MiniCFF /FontDescriptor",
        b"/BaseFont /MiniCFF /Encoding /StandardEncoding"
        b" /FontDescriptor",
        1,
    )
    assert MP.extract_text_pages(with_std) == ["\x80\x81"]
    with_unknown = pdf.replace(
        b"/BaseFont /MiniCFF /FontDescriptor",
        b"/BaseFont /MiniCFF /Encoding"
        b" << /Differences [128 /nosuchglyphname /alsonotreal] >>"
        b" /FontDescriptor",
        1,
    )
    assert MP.extract_text_pages(with_unknown) == ["\x80\x81"]
    # truly ABSENT /Encoding still takes the CFF route (regression)
    assert MP.extract_text_pages(pdf) == ["AB"]


def _make_cid_keyed_cff() -> bytes:
    """A syntactically valid CID-keyed CFF: take the name-keyed _make_cff
    output and rewrite its Top DICT to carry ROS (same surgery as
    test_cff_maps_rejects_cid_keyed_and_garbage)."""
    good = MP._make_cff(["A"], [65])
    ros_op = (
        b"\x1d" + (391).to_bytes(4, "big")
        + b"\x1d" + (391).to_bytes(4, "big")
        + b"\x1d" + (0).to_bytes(4, "big")
    )
    top_start = good.index(b"\x00\x01\x01") + 5
    cid_dict = ros_op[:13] + b"\x0c\x1e" + b"\x1d" + good[
        top_start + 13 : top_start + 17
    ]
    bad = bytearray(good)
    bad[good.index(b"\x00\x01\x01") : top_start + 18] = (
        b"\x00\x01\x01" + bytes([1, 21]) + cid_dict
    )
    return bytes(bad)


def test_cid_keyed_bare_cff_refusal_end_to_end():
    """VERDICT r7 #6: a Type0 font whose descendant embeds a CID-KEYED
    bare CFF (FontFile3 /CIDFontType0C).  Without /ToUnicode there is
    structurally nothing to recover (charset holds CIDs, not names;
    Identity ordering has no unicode semantics; registry orderings need
    Adobe's external CMap resources) — the documented behavior is the
    crash-free per-code identity fall-through.  With /ToUnicode the
    authoritative path is untouched by the embedded program."""
    import zlib as _z

    pdf = MP.make_pdf_cid([["AB"]])  # cids: A->1, B->2
    prog = _z.compress(_make_cid_keyed_cff())
    # next free object numbers (builder uses 1..7 for one page)
    n_obj = max(
        int(m.group(1)) for m in MP._OBJ_RE.finditer(pdf)
    )
    fd_num, ff_num = n_obj + 1, n_obj + 2
    extra = (
        b"%d 0 obj\n<< /Type /FontDescriptor /FontName /MiniSans "
        b"/FontFile3 %d 0 R >>\nendobj\n" % (fd_num, ff_num)
        + b"%d 0 obj\n<< /Length %d /Filter /FlateDecode "
        b"/Subtype /CIDFontType0C >>\nstream\n" % (ff_num, len(prog))
        + prog
        + b"\nendstream\nendobj\n"
    )
    grafted = pdf.replace(
        b"/DW 1000 /CIDToGIDMap /Identity >>",
        b"/DW 1000 /CIDToGIDMap /Identity /FontDescriptor %d 0 R >>"
        % fd_num,
        1,
    ).replace(b"xref\n", extra + b"xref\n", 1)
    # ToUnicode present: authoritative, program ignored
    assert MP.extract_text_pages(grafted) == ["AB"]
    # ToUnicode absent: pinned refusal -> per-code identity, no crash
    no_tu = grafted.replace(b"/ToUnicode 5 0 R ", b"", 1)
    assert MP.extract_text_pages(no_tu) == ["\x01\x02"]
