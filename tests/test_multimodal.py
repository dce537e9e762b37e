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
