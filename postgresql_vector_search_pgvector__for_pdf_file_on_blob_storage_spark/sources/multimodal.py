"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched UDFs (SURVEY.md §2B B15 + the
training-data-pipeline brief).

Design for 100 TB: media bytes ride in a ``BinaryType`` column next to the
text/embedding columns; nothing ever decodes on the driver.  Decode /
resize / frame-sample run in ``mapInPandas`` so one Python crossing handles
a whole Arrow batch, and the output schema is fixed so downstream plans are
stable whether the codec is real or stubbed.

Codec gating: real decoders (PIL / soundfile / av) are not in this
container, so each UDF first tries the real library, then falls back to the
deterministic FAKE container formats below (tests use these).  The Spark
plumbing — schemas, batch iteration, partitioning — is identical either
way, which is the point: swapping in the real codec is a one-function
change.

FAKE formats (deterministic, self-describing):
- image: ``IMGv1:<width>x<height>x<channels>:`` + row-major uint8 pixels
- audio: ``AUDv1:<sample_rate>:<n_samples>:`` + uint8 samples
- video: ``VIDv1:<n_frames>:<frame_len>:`` + concatenated frame payloads
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_MAGIC = b"IMGv1:"
AUDIO_MAGIC = b"AUDv1:"
VIDEO_MAGIC = b"VIDv1:"

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, "
    "meta struct<source:string, codec:string>"
)
IMAGE_INFO_SCHEMA = (
    "media_id bigint, width int, height int, channels int, mean_pixel double"
)
THUMB_SCHEMA = "media_id bigint, width int, height int, content binary"
FRAME_SCHEMA = "media_id bigint, frame_idx int, frame bytes".replace(
    "bytes", "binary"
)
AUDIO_INFO_SCHEMA = (
    "media_id bigint, sample_rate int, n_samples int, rms double"
)


# ---------------------------------------------------------------------------
# FAKE codecs (pure functions, unit-testable)
# ---------------------------------------------------------------------------

def encode_fake_image(w: int, h: int, c: int = 3, seed: int = 0) -> bytes:
    rng = np.random.Generator(np.random.PCG64(seed))
    pixels = rng.integers(0, 256, size=w * h * c, dtype=np.uint8)
    return IMAGE_MAGIC + f"{w}x{h}x{c}:".encode() + pixels.tobytes()


def decode_fake_image(b: bytes) -> tuple[int, int, int, np.ndarray] | None:
    if not b or not b.startswith(IMAGE_MAGIC):
        return None
    head, _, rest = b[len(IMAGE_MAGIC) :].partition(b":")
    w, h, c = (int(x) for x in head.decode().split("x"))
    px = np.frombuffer(rest, dtype=np.uint8)
    if px.size != w * h * c:
        return None
    return w, h, c, px.reshape(h, w, c)


def encode_fake_audio(rate: int, samples: np.ndarray) -> bytes:
    s = samples.astype(np.uint8)
    return AUDIO_MAGIC + f"{rate}:{s.size}:".encode() + s.tobytes()


def encode_fake_video(frames: list[bytes]) -> bytes:
    if not frames:
        return VIDEO_MAGIC + b"0:0:"
    flen = len(frames[0])
    assert all(len(f) == flen for f in frames)
    return VIDEO_MAGIC + f"{len(frames)}:{flen}:".encode() + b"".join(frames)


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

def decode_ppm(b: bytes) -> tuple[int, int, int, np.ndarray] | None:
    """Stdlib-only decoder for binary PPM/PGM (netpbm ``P6``/``P5``) —
    a REAL uncompressed public image format, parsed without PIL: magic,
    then whitespace/comment-separated width, height, maxval tokens, one
    whitespace byte, then raw samples (1 byte per sample for maxval
    <= 255).  Returns ``(w, h, channels, pixels[h, w, c])`` or None for
    anything malformed (logged-and-skipped semantics upstream)."""
    if not b or b[:2] not in (b"P6", b"P5"):
        return None
    channels = 3 if b[:2] == b"P6" else 1
    pos, tokens = 2, []
    try:
        while len(tokens) < 3:
            while pos < len(b) and b[pos : pos + 1].isspace():
                pos += 1
            if b[pos : pos + 1] == b"#":  # comment runs to end of line
                while pos < len(b) and b[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(b) and not b[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(b[start:pos]))
        pos += 1  # exactly ONE whitespace byte after maxval (spec)
        w, h, maxval = tokens
        if w <= 0 or h <= 0 or not (0 < maxval <= 255):
            return None
        px = np.frombuffer(b, dtype=np.uint8, count=w * h * channels,
                           offset=pos)
        if px.size != w * h * channels:
            return None
        return w, h, channels, px.reshape(h, w, channels)
    except (ValueError, IndexError):
        return None


def encode_ppm(w: int, h: int, pixels: np.ndarray) -> bytes:
    """Binary PPM (``P6``) encoder for uint8 RGB pixels — the fixture
    writer for the real-format decode path (w*h*3 samples)."""
    px = np.asarray(pixels, dtype=np.uint8).reshape(-1)
    assert px.size == w * h * 3
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def decode_wav(b: bytes) -> tuple[int, int, np.ndarray] | None:
    """Stdlib-only decoder for RIFF/WAVE PCM 16-bit MONO — the real
    uncompressed public audio format, parsed without soundfile: the
    ``RIFF``/``WAVE`` preamble, then a chunk walk (any non-fmt/data
    chunks are skipped per spec, so files with LIST/INFO metadata still
    parse) to the ``fmt `` chunk (must declare format tag 1 = PCM, one
    channel, 16 bits — anything else returns None: compressed or
    multi-channel audio needs a real codec and must not be silently
    misread) and the ``data`` chunk.  Returns ``(sample_rate,
    n_samples, samples[int16])`` or None for anything malformed
    (logged-and-skipped semantics upstream, as with :func:`decode_ppm`)."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, rate, bits, ch, fmt_tag, data = 12, None, None, None, None, None
    try:
        while pos + 8 <= len(b):
            cid = b[pos : pos + 4]
            (size,) = struct.unpack_from("<I", b, pos + 4)
            body = b[pos + 8 : pos + 8 + size]
            if cid == b"fmt " and size >= 16:
                fmt_tag, ch, rate, _, _, bits = struct.unpack_from(
                    "<HHIIHH", body, 0
                )
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if (fmt_tag, ch, bits) != (1, 1, 16) or rate is None or data is None:
            return None
        samples = np.frombuffer(data, dtype="<i2")
        return int(rate), int(samples.size), samples
    except (struct.error, ValueError):
        return None


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """RIFF/WAVE PCM 16-bit mono encoder — the fixture writer for the
    real-format audio decode path (:func:`decode_wav`'s exact layout:
    canonical 44-byte header, little-endian int16 payload)."""
    import struct

    data = np.asarray(samples, dtype="<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, int(rate), int(rate) * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _decode_image_any(b: bytes):
    """Real decoders first (stdlib PPM/PGM, then PIL if present), FAKE
    fallback; None for undecodable."""
    decoded = decode_fake_image(b)
    if decoded is not None:
        return decoded
    decoded = decode_ppm(b)
    if decoded is not None:
        return decoded
    try:  # pragma: no cover - PIL absent in the build container
        import io

        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(b)))
        h, w = img.shape[:2]
        c = 1 if img.ndim == 2 else img.shape[2]
        return w, h, c, img.reshape(h, w, c)
    except Exception:
        return None


def image_info(media: DataFrame) -> DataFrame:
    """Decode + per-image stats: ``(media_id, width, height, channels,
    mean_pixel)``.  Undecodable rows are dropped (logged-and-skipped
    semantics, like the reference's per-page parse errors)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ["media_id", "width", "height", "channels", "mean_pixel"]}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = _decode_image_any(content)
                if d is None:
                    continue
                w, h, c, px = d
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["mean_pixel"].append(float(px.mean()))
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(gen, IMAGE_INFO_SCHEMA)


def image_resize(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize to ``(out_w, out_h)``, re-encoded in the FAKE
    container: ``(media_id, width, height, content)``.  A real deployment
    swaps the two codec calls for PIL — the plan shape is unchanged."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ["media_id", "width", "height", "content"]}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = _decode_image_any(content)
                if d is None:
                    continue
                w, h, c, px = d
                ys = (np.arange(out_h) * h // out_h)
                xs = (np.arange(out_w) * w // out_w)
                small = px[ys][:, xs]
                out["media_id"].append(mid)
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["content"].append(
                    IMAGE_MAGIC
                    + f"{out_w}x{out_h}x{c}:".encode()
                    + small.tobytes()
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(gen, THUMB_SCHEMA)


def video_sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling: every ``every``-th frame as its own row
    ``(media_id, frame_idx, frame)`` — the explode shape for video corpora."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ["media_id", "frame_idx", "frame"]}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if not content or not content.startswith(VIDEO_MAGIC):
                    continue
                head = content[len(VIDEO_MAGIC) :]
                n, _, rest = head.partition(b":")
                flen, _, payload = rest.partition(b":")
                n, flen = int(n), int(flen)
                for i in range(0, n, every):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame"].append(payload[i * flen : (i + 1) * flen])
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(gen, FRAME_SCHEMA)


def audio_info(media: DataFrame) -> DataFrame:
    """Decode + RMS energy: ``(media_id, sample_rate, n_samples, rms)``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ["media_id", "sample_rate", "n_samples", "rms"]}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if not content:
                    continue
                if content.startswith(AUDIO_MAGIC):
                    head = content[len(AUDIO_MAGIC) :]
                    rate, _, rest = head.partition(b":")
                    n, _, payload = rest.partition(b":")
                    rate, n = int(rate), int(n)
                    samples = np.frombuffer(payload, dtype=np.uint8).astype(
                        np.float64
                    )
                else:
                    wav = decode_wav(bytes(content))
                    if wav is None:
                        continue
                    rate, n, raw = wav
                    # int16 squares sum exactly in float64 (values
                    # <= 2^30, sums far below 2^53) -> the rms is
                    # bit-deterministic: one exact sum, one IEEE divide,
                    # one sqrt.
                    samples = raw.astype(np.float64)
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["rms"].append(float(np.sqrt((samples**2).mean())))
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(gen, AUDIO_INFO_SCHEMA)


def media_embedding(media: DataFrame, dim: int = 64) -> DataFrame:
    """Deterministic feature vector for any media payload — the multimodal
    twin of the text hash-embedder: sha256(bytes) seeds the vector.  Keeps
    (media_id, kind, embedding) so multimodal rows join the text/vector
    tables directly."""
    from ..functions.embed import hash_embed_py

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            emb = [
                hash_embed_py(content.hex() if content else "", dim)
                for content in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "embedding": emb,
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(
        gen, "media_id bigint, kind string, embedding array<float>"
    )


IMAGE_PROFILE_SCHEMA = (
    "media_id bigint, width int, height int, channels int, "
    "mean_pixel double, embedding array<float>"
)


def image_profile(media: DataFrame, dim: int = 64) -> DataFrame:
    """Decode stats AND media embedding in ONE ``mapInPandas`` pass —
    chaining :func:`image_info` + :func:`media_embedding` would synthesize
    and ship every payload across the Python boundary twice; a fused pass
    reads each binary cell once (the dominant cost at scale)."""
    from ..functions.embed import hash_embed_py

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in [
                    "media_id", "width", "height", "channels",
                    "mean_pixel", "embedding",
                ]
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = _decode_image_any(content)
                if d is None:
                    continue
                w, h, c, px = d
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["mean_pixel"].append(float(px.mean()))
                out["embedding"].append(
                    hash_embed_py(content.hex() if content else "", dim)
                )
            if out["media_id"]:
                # An all-skipped batch must yield nothing: an EMPTY pandas
                # column defaults to float64, which Arrow cannot cast to
                # the declared list<float> embedding type.
                yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        gen, IMAGE_PROFILE_SCHEMA
    )
