"""Pluggable text-embedding operator.

Reference: ``invokeTextEmbedding`` calls Azure OpenAI
``text-embedding-ada-002`` (1536-d) with <=3 retries / 10 s backoff and
returns an empty list after final failure (Function.java:48,181-210,262-269);
the query path embeds the user's question the same way
(SSEOpenAIController.java:301-307).

Engine design (SURVEY.md §7.4 item 2): the embedder is an interface.
- ``hash_embedder(dim)``: deterministic, network-free — every test and the
  driver's oracle can reproduce vectors bit-for-bit.  Vectorized with NumPy
  inside an Arrow-batched pandas UDF (the Python boundary is crossed once
  per batch, not per row).
- A production embedder would be another pandas UDF batching texts to a
  vendor API with in-UDF retry/backoff + token-bucket pacing mirroring
  ``OPENAI_INVOCATION_INTERVAL`` (Function.java:45); it is intentionally NOT
  implemented here (no network in this environment) — the seam is the UDF
  signature ``string -> array<float>``.

Float32 semantics: pgvector stores float4 (SURVEY.md §1.2), so vectors are
rounded through float32 before leaving the UDF.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["DEFAULT_DIM", "hash_embed_py", "hash_embedder"]

# Test-scale dim matches the fixtures' embeddings table (FIXTURES.md: dim 64
# at test scale; reference is 1536 — same semantics, cheaper oracle).
DEFAULT_DIM = 64


def _seed_from_text(text: str) -> int:
    return int.from_bytes(hashlib.sha256(text.encode("utf-8")).digest()[:8], "big")


def hash_embed_py(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Deterministic unit-norm embedding: sha256(text) seeds a PCG64 stream,
    dim gaussians, L2-normalized, rounded through float32."""
    rng = np.random.Generator(np.random.PCG64(_seed_from_text(text)))
    v = rng.standard_normal(dim)
    v = v / np.linalg.norm(v)
    return [float(x) for x in v.astype(np.float32)]


def hash_embedder(dim: int = DEFAULT_DIM):
    """Arrow-batched pandas UDF ``string -> array<float>``.

    NumPy does the math per batch; only the sha256 seeding is per-row.
    """

    @F.pandas_udf(T.ArrayType(T.FloatType(), containsNull=False))
    def _embed(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                # Reference returns an empty list on terminal failure
                # (Function.java:207-209) — null text is our analog.
                out.append([])
            else:
                out.append(hash_embed_py(t, dim))
        return pd.Series(out)

    return _embed
