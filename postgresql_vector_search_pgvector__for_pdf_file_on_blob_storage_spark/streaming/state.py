"""Custom stateful streaming operator: the reference's per-chunk status
state machine (SURVEY.md §2A row 30) as an ``applyInPandasWithState`` fold.

The reference mutates one Cosmos document per chunk as it advances
(``createDocument`` / ``updateStatus`` read-modify-replace,
BlobUploadDetector/.../CosmosDBUtil.java:43-75), with the legal progression
of Function.java:140-175.  Batch mode replays the whole event log; this
operator is the *incremental* form — per-id state lives in the state store,
each micro-batch folds only the new events, and the emitted row is always
the validated current status.  State per key is O(1) (status, counters),
so the operator scales with the number of *live* chunks, not event volume.

The reference's unconditional COMPLETED-after-failure quirk
(Function.java:175) is deliberately NOT legal here (documented divergence,
SURVEY.md §7.4 item 4): a COMPLETED arriving after FAILED_DB_INSERTION
marks the chunk ``valid = false`` instead of silently succeeding.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame

# Legal transitions (Function.java:140-175).  None = initial.
_ALLOWED: dict[str | None, set[str]] = {
    None: {"PAGE_SEPARATE_FINISHED"},
    "PAGE_SEPARATE_FINISHED": {"RETRY_OAI_INVOCATION", "FINISH_OAI_INVOCATION"},
    "RETRY_OAI_INVOCATION": {"RETRY_OAI_INVOCATION", "FINISH_OAI_INVOCATION"},
    "FINISH_OAI_INVOCATION": {"FINISH_DB_INSERTION", "FAILED_DB_INSERTION"},
    "FINISH_DB_INSERTION": {"COMPLETED"},
    "FAILED_DB_INSERTION": set(),
    "COMPLETED": set(),
}

OUTPUT_SCHEMA = "id string, status string, n_events int, valid boolean"
_STATE_SCHEMA = "status string, n_events int, valid boolean, max_seq long"


def fold_status(
    start: tuple[str | None, int, bool],
    statuses: Iterable[str],
) -> tuple[str | None, int, bool]:
    """Pure fold of a status sequence onto ``(status, n_events, valid)`` —
    unit-testable without Spark, shared by the streaming operator and its
    batch twin so the two can never drift."""
    cur, n, valid = start
    for s in statuses:
        valid = valid and (s in _ALLOWED.get(cur, set()))
        cur = s
        n += 1
    return cur, n, valid


def _fold_group(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: Any,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        cur, n, valid, max_seq = state.get
    else:
        cur, n, valid, max_seq = None, 0, True, -1
    # Stable sort: duplicate seq values must fold deterministically.  The
    # sort orders *within* this micro-batch only; an event arriving in a
    # LATER batch with seq <= max_seq is out of order across batches — it
    # cannot be spliced back, so it is folded (keeping counts honest) and
    # the chunk is flagged invalid, a detectable divergence from the batch
    # twin (which sorts the whole log).  With an in-order source (the file
    # source replaying an append-only log, as in ingest) the twins agree.
    batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
        "seq", kind="mergesort"
    )
    if len(batch) and int(batch["seq"].iloc[0]) <= max_seq:
        valid = False
    cur, n, valid = fold_status((cur, n, valid), batch["status"])
    if len(batch):
        max_seq = max(max_seq, int(batch["seq"].iloc[-1]))
    state.update((cur, n, valid, max_seq))
    yield pd.DataFrame(
        {"id": [key[0]], "status": [cur], "n_events": [n], "valid": [valid]}
    )


def track_status_stream(status_events: DataFrame) -> DataFrame:
    """Incremental current-status view over a *streaming* event log
    ``(id, status, seq, ...)``.  Emits one updated row per chunk per
    micro-batch (output mode ``update``)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return status_events.groupBy("id").applyInPandasWithState(
        _fold_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def track_status_batch(status_events: DataFrame) -> DataFrame:
    """Batch twin of :func:`track_status_stream` — same fold, whole log at
    once (``applyInPandas`` per id).  Streaming-vs-batch equality is the
    correctness check in tests/test_streaming.py."""

    def fold_all(pdf: pd.DataFrame) -> pd.DataFrame:
        ordered = pdf.sort_values("seq", kind="mergesort")
        cur, n, valid = fold_status((None, 0, True), ordered["status"])
        return pd.DataFrame(
            {
                "id": [pdf["id"].iloc[0]],
                "status": [cur],
                "n_events": [n],
                "valid": [valid],
            }
        )

    return status_events.groupBy("id").applyInPandas(
        fold_all, schema=OUTPUT_SCHEMA
    )
