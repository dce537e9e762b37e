"""Multimodal binary-column operators: decode, resize, frame-sample,
audio stats, media embeddings — over the deterministic FAKE codecs."""

import numpy as np
import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.sources import (
    multimodal as MM,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", bytearray(MM.encode_fake_image(8, 4, 3, seed=1)), ("s1", "fake")),
        (2, "image", bytearray(MM.encode_fake_image(16, 16, 1, seed=2)), ("s1", "fake")),
        (3, "audio", bytearray(MM.encode_fake_audio(16000, np.arange(100) % 256)), ("s2", "fake")),
        (4, "video", bytearray(MM.encode_fake_video([b"AAAA", b"BBBB", b"CCCC", b"DDDD", b"EEEE"])), ("s3", "fake")),
        (5, "image", bytearray(b"not an image"), ("s4", "fake")),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA).cache()


def test_image_info(spark, media):
    out = {r["media_id"]: r for r in MM.image_info(media).collect()}
    assert set(out) == {1, 2}  # undecodable id=5 dropped, non-images skipped
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (8, 4, 3)
    w, h, c, px = MM.decode_fake_image(MM.encode_fake_image(8, 4, 3, seed=1))
    assert out[1]["mean_pixel"] == pytest.approx(float(px.mean()))


def test_image_resize_roundtrip(spark, media):
    out = {r["media_id"]: r for r in MM.image_resize(media, 4, 2).collect()}
    assert set(out) == {1, 2}
    d = MM.decode_fake_image(bytes(out[1]["content"]))
    assert d is not None
    w, h, c, px = d
    assert (w, h, c) == (4, 2, 3)


def test_video_frame_sampling(spark, media):
    frames = MM.video_sample_frames(media, every=2).collect()
    got = {(r["media_id"], r["frame_idx"]): bytes(r["frame"]) for r in frames}
    assert got == {(4, 0): b"AAAA", (4, 2): b"CCCC", (4, 4): b"EEEE"}


def test_audio_info(spark, media):
    out = MM.audio_info(media).collect()
    assert len(out) == 1
    r = out[0]
    samples = (np.arange(100) % 256).astype(np.float64)
    assert r["sample_rate"] == 16000
    assert r["n_samples"] == 100
    assert r["rms"] == pytest.approx(float(np.sqrt((samples**2).mean())))


def test_media_embedding_deterministic_and_dim(spark, media):
    a = {r["media_id"]: r["embedding"] for r in MM.media_embedding(media).collect()}
    b = {r["media_id"]: r["embedding"] for r in MM.media_embedding(media).collect()}
    assert set(a) == {1, 2, 3, 4, 5}
    for k in a:
        assert len(a[k]) == 64
        assert a[k] == b[k]
    assert a[1] != a[2]


def test_image_profile_fuses_info_and_embedding(spark, media):
    """image_profile == image_info ⋈ media_embedding, in one pass."""
    prof = {r["media_id"]: r for r in MM.image_profile(media, dim=16).collect()}
    info = {r["media_id"]: r for r in MM.image_info(media).collect()}
    emb = {
        r["media_id"]: r["embedding"]
        for r in MM.media_embedding(media, dim=16).collect()
    }
    assert set(prof) == set(info)
    for mid, r in prof.items():
        i = info[mid]
        assert (r["width"], r["height"], r["channels"]) == (
            i["width"], i["height"], i["channels"],
        )
        assert r["mean_pixel"] == i["mean_pixel"]
        assert r["embedding"] == emb[mid]


def test_ppm_roundtrip_and_comments():
    px = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(4, 5, 3)
    b = MM.encode_ppm(5, 4, px)
    w, h, c, out = MM.decode_ppm(b)
    assert (w, h, c) == (5, 4, 3)
    assert np.array_equal(out, px)
    # header comments (the netpbm spec allows them before any token)
    commented = b"P6\n# made by a test\n5 4\n# and one more\n255\n" + px.tobytes()
    w2, h2, c2, out2 = MM.decode_ppm(commented)
    assert (w2, h2, c2) == (5, 4, 3) and np.array_equal(out2, px)
    # P5 grayscale: one channel
    g = np.arange(6, dtype=np.uint8)
    w3, h3, c3, out3 = MM.decode_ppm(b"P5\n3 2\n255\n" + g.tobytes())
    assert (w3, h3, c3) == (3, 2, 1)
    assert np.array_equal(out3.reshape(-1), g)


def test_ppm_malformed_returns_none():
    assert MM.decode_ppm(b"") is None
    assert MM.decode_ppm(b"P3\n1 1\n255\n xxx") is None  # ASCII ppm: unsupported
    assert MM.decode_ppm(b"P6\n2 2\n255\nshort") is None  # truncated payload
    assert MM.decode_ppm(b"P6\n0 2\n255\n") is None  # zero dim
    assert MM.decode_ppm(b"P6\n2 2\n70000\n" + b"x" * 12) is None  # 2-byte maxval
    assert MM.decode_ppm(b"P6\n2 abc\n255\n" + b"x" * 12) is None  # bad token


def test_image_info_decodes_real_ppm(spark):
    px = (7 * np.arange(2 * 3 * 3, dtype=np.int64) % 256).astype(np.uint8)
    rows = [(1, MM.encode_ppm(2, 3, px)), (2, b"not an image")]
    media = spark.createDataFrame(rows, "media_id bigint, content binary")
    out = MM.image_info(media).collect()
    assert len(out) == 1  # the garbage row is skipped, not an error
    r = out[0]
    assert (r["media_id"], r["width"], r["height"], r["channels"]) == (1, 2, 3, 3)
    assert abs(r["mean_pixel"] - float(px.mean())) < 1e-12


def test_wav_roundtrip_and_chunk_walk():
    s = (np.arange(100, dtype=np.int64) * 13 % 2001 - 1000).astype(np.int16)
    b = MM.encode_wav(16000, s)
    rate, n, out = MM.decode_wav(b)
    assert (rate, n) == (16000, 100)
    assert np.array_equal(out, s)
    # a LIST metadata chunk between fmt and data must be skipped (spec),
    # including the word-alignment pad byte after an odd-sized chunk.
    import struct

    fmt = b[12:36]          # the canonical fmt chunk
    data = b[36:]           # the data chunk
    meta = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd + pad
    riff_body = b"WAVE" + fmt + meta + data
    padded = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
    rate2, n2, out2 = MM.decode_wav(padded)
    assert (rate2, n2) == (16000, 100) and np.array_equal(out2, s)


def test_wav_refuses_what_it_cannot_represent():
    import struct

    s = np.zeros(4, dtype=np.int16)
    good = MM.encode_wav(8000, s)
    assert MM.decode_wav(b"") is None
    assert MM.decode_wav(b"RIFFxxxxNOPE") is None
    # stereo: channels=2 in the fmt chunk -> loud refusal, not misread
    stereo = bytearray(good)
    struct.pack_into("<H", stereo, 22, 2)
    assert MM.decode_wav(bytes(stereo)) is None
    # non-PCM format tag
    alaw = bytearray(good)
    struct.pack_into("<H", alaw, 20, 6)
    assert MM.decode_wav(bytes(alaw)) is None
    # 8-bit samples
    eight = bytearray(good)
    struct.pack_into("<H", eight, 34, 8)
    assert MM.decode_wav(bytes(eight)) is None


def test_audio_info_decodes_real_wav(spark):
    s = (np.arange(50, dtype=np.int64) * 7 % 2001 - 1000).astype(np.int16)
    rows = [
        (1, MM.encode_wav(8000, s)),
        (2, b"not audio"),
        (3, MM.encode_fake_audio(44100, np.arange(10, dtype=np.uint8))),
    ]
    media = spark.createDataFrame(rows, "media_id bigint, content binary")
    out = {r["media_id"]: r for r in MM.audio_info(media).collect()}
    assert set(out) == {1, 3}  # garbage skipped; fake + real both decode
    assert (out[1]["sample_rate"], out[1]["n_samples"]) == (8000, 50)
    want = float(np.sqrt((s.astype(np.float64) ** 2).mean()))
    assert out[1]["rms"] == want  # exact: integer squares sum exactly
    assert out[3]["sample_rate"] == 44100


def test_wav_roundtrip_property():
    """Hypothesis: encode_wav -> decode_wav is the identity for ANY int16
    sample vector and rate (the container adds no lossy step), including
    odd byte lengths' word-alignment interaction."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=60, deadline=None)
    @given(
        rate=st.integers(min_value=1, max_value=384_000),
        s=arrays(np.int16, st.integers(min_value=0, max_value=300)),
    )
    def prop(rate, s):
        got = MM.decode_wav(MM.encode_wav(rate, s))
        assert got is not None
        r2, n2, out = got
        assert (r2, n2) == (rate, s.size)
        assert np.array_equal(out, s)

    prop()
