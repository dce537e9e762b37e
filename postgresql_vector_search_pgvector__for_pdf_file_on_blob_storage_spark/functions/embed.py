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

__all__ = [
    "DEFAULT_DIM",
    "hash_embed_py",
    "hash_embedder",
    "retrying_embedder",
    "flaky_transport",
    "http_transport",
    "local_embedding_server",
]

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


def retrying_embedder(
    transport,
    max_attempts: int = 3,
    backoff_s: float = 0.0,
    min_interval_s: float = 0.0,
):
    """The PRODUCTION embedder seam, demonstrated: a pandas UDF
    ``string -> struct<embedding array<float>, attempts int>`` with in-UDF
    retry / backoff / empty-list-on-final-failure — the exact loop the
    reference runs per invocation (``invokeTextEmbedding``: <=3 attempts,
    10 s sleep between, empty list after the last failure —
    Function.java:48,181-210,262-269).

    ``transport(text, attempt) -> list[float]`` performs one attempt and
    raises on failure (a vendor-API transport ignores ``attempt``; the
    deterministic test transport uses it to fail transiently).  ``attempts``
    rides along so the ingest pipeline can emit one
    ``RETRY_OAI_INVOCATION`` status event per retry, matching the
    reference's event sequence; a terminal failure yields an empty
    embedding, which fails the vector-dimension invariant at insert time
    and lands the row on the ``FAILED_DB_INSERTION`` path end-to-end.

    ``min_interval_s`` is the reference's inter-call pacing
    (``OPENAI_INVOCATION_INTERVAL`` = 20 ms, Function.java:45,148): each
    Python worker spaces its transport calls at least that far apart, so
    cluster-wide request rate is bounded by ``workers / interval`` —
    per-worker state, deliberately NOT coordinated across executors (the
    reference paces per JVM the same way; size the interval to
    quota / max-parallelism).
    """
    import time

    @F.pandas_udf("embedding array<float>, attempts int")
    def _embed(texts: pd.Series) -> pd.DataFrame:
        embs: list[list[float]] = []
        atts: list[int] = []
        last_call = [float("-inf")]

        def paced(t: str, attempt: int):
            if min_interval_s:
                wait = last_call[0] + min_interval_s - time.monotonic()
                if wait > 0:
                    time.sleep(wait)
                last_call[0] = time.monotonic()
            return transport(t, attempt)

        for t in texts:
            vec: list[float] = []
            attempt = 0
            while attempt < max_attempts:
                attempt += 1
                try:
                    vec = paced(t, attempt)
                    break
                except Exception:
                    vec = []  # empty on final failure (Function.java:207-209)
                    if attempt < max_attempts and backoff_s:
                        time.sleep(backoff_s)
            embs.append(vec)
            atts.append(attempt)
        return pd.DataFrame({"embedding": embs, "attempts": atts})

    return _embed


def http_transport(url: str, dim: int | None = None, timeout_s: float = 10.0):
    """A REAL network transport for :func:`retrying_embedder` (r10 —
    closes SURVEY §7.4 item 2's "no vendor HTTP client" gap as far as a
    sandbox can): one HTTP POST per attempt in the vendor embedding API's
    wire shape — request ``{"input": <text>}``, response
    ``{"data": [{"embedding": [...]}]}`` (the Azure OpenAI
    ``text-embedding-ada-002`` call the reference makes,
    Function.java:181-210) — stdlib ``urllib`` only, no SDK.

    Raises on HTTP status / timeout / malformed body / wrong
    dimension — exactly the failures the retry loop exists for, now
    arriving through a real socket instead of an injected exception.
    Point it at the vendor endpoint in production, or at
    :func:`local_embedding_server` for a deterministic loopback twin
    (the tests and the ``embed_http_pipeline`` driver query do).

    The closure captures only the URL string, so the pandas UDF ships it
    to executors intact; each Python worker opens its own connections
    (no shared session state — retries are per-row, per-worker, exactly
    like the reference's per-invocation HttpClient)."""

    def transport(text: str, attempt: int) -> list[float]:
        import json as _json
        import urllib.request

        if text is None:
            raise ValueError("null text")
        req = urllib.request.Request(
            url,
            data=_json.dumps({"input": text}).encode("utf-8"),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            body = _json.loads(resp.read().decode("utf-8"))
        emb = body["data"][0]["embedding"]
        if dim is not None and len(emb) != dim:
            raise ValueError(f"embedding dim {len(emb)} != expected {dim}")
        return [float(x) for x in emb]

    return transport


def local_embedding_server(
    dim: int = DEFAULT_DIM,
    fail_first: int = 0,
    transient_marker: str = "<<TRANSIENT>>",
    fatal_marker: str = "<<FATAL>>",
):
    """Loopback stand-in for the vendor embeddings endpoint (stdlib
    ``ThreadingHTTPServer``, daemon thread): answers the
    :func:`http_transport` wire shape with the deterministic hash
    embedding, so the whole retry/pacing/HTTP stack runs over a REAL
    socket while results stay bit-reproducible.

    Failure injection mirrors :func:`flaky_transport`, but as real HTTP
    errors: texts containing ``fatal_marker`` always get 503; texts
    containing ``transient_marker`` get 429 for their first
    ``fail_first`` requests (counted per text, thread-safe) and the
    hash embedding afterwards.

    Returns ``(server, url)``; call ``server.shutdown()`` when done.
    """
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    seen: dict[str, int] = {}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 — http.server API
            n = int(self.headers.get("Content-Length", 0))
            text = _json.loads(self.rfile.read(n).decode("utf-8"))["input"]
            if fatal_marker in text:
                self.send_error(503, "simulated terminal vendor failure")
                return
            if transient_marker in text:
                with lock:
                    seen[text] = seen.get(text, 0) + 1
                    if seen[text] <= fail_first:
                        self.send_error(429, "simulated rate limit")
                        return
            body = _json.dumps(
                {"data": [{"embedding": hash_embed_py(text, dim)}]}
            ).encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # silence request logging
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}/embeddings"
    return server, url


def flaky_transport(
    dim: int = DEFAULT_DIM,
    transient_marker: str = "<<TRANSIENT>>",
    fatal_marker: str = "<<FATAL>>",
    fail_attempts: int = 2,
):
    """Deterministic mock transport for :func:`retrying_embedder` tests:
    texts containing ``fatal_marker`` fail every attempt (terminal), texts
    containing ``transient_marker`` fail the first ``fail_attempts``
    attempts then succeed, everything else succeeds immediately (the
    deterministic hash embedding)."""

    def transport(text: str, attempt: int) -> list[float]:
        if text is None:
            raise ValueError("null text")
        if fatal_marker in text:
            raise TimeoutError("simulated terminal vendor failure")
        if transient_marker in text and attempt <= fail_attempts:
            raise TimeoutError("simulated transient vendor failure")
        return hash_embed_py(text, dim)

    return transport
