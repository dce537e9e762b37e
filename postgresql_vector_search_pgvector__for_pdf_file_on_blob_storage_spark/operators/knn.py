"""Exact k-nearest-neighbor search, kNN join, and similarity (range) join.

Reference hot query (SSEOpenAIController.java:315-316):

    SELECT id, origntext, filename, pageNumber FROM <t>
    ORDER BY embedding <-> ?::vector LIMIT 5

pgvector never gets an ANN index in the reference (create-env.sh:177-180 —
table DDL only), so the correctness target is an **exact brute-force scan**
(SURVEY.md §4.2).  Spark physical plan: vectorized parquet scan -> native
distance expression (codegen) -> ``TakeOrderedAndProject`` (per-partition
top-k heap + driver merge — no global sort, no full shuffle).  That plan is
exactly what survives a 100 TB scan: each executor returns k rows.

Scale notes
- The probe side is always broadcast (a handful of rows); the item side is
  never moved.
- ``knn_join`` avoids the naive crossJoin-then-window (which shuffles
  n_items x n_probes rows) by aggregating a bounded top-k *array* per
  partition per probe (``slice(sort_array(collect_list(...)))``), then
  merging the per-partition candidates — shuffle volume is
  O(n_partitions x n_probes x k), independent of item count.
- For ordering we use squared L2 (monotone with L2) and only take the sqrt
  on the k survivors.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import vector as V
from ..utils import collect_bounded, spread

__all__ = ["distance_expr", "knn", "knn_join", "similarity_join"]

_METRICS = ("l2", "cosine", "dot")


def distance_expr(metric: str, a: Column | str, b: Column | str) -> Column:
    """pgvector operator family: l2 = ``<->``, cosine = ``<=>``,
    dot = ``<#>`` (negative inner product; ASC order = most similar)."""
    if metric == "l2":
        return V.l2_distance(a, b)
    if metric == "cosine":
        return V.cosine_distance(a, b)
    if metric == "dot":
        return V.neg_inner_product(a, b)
    raise ValueError(f"metric must be one of {_METRICS}, got {metric!r}")


def _order_expr(metric: str, a: Column | str, b: Column | str) -> Column:
    # Cheaper monotone surrogate for ordering; equal ordering to distance_expr.
    if metric == "l2":
        return V.squared_l2_distance(a, b)
    return distance_expr(metric, a, b)


def knn(
    items: DataFrame,
    probe: Sequence[float] | Column,
    k: int = 5,
    metric: str = "l2",
    vec_col: str = "embedding",
    dist_col: str = "dist",
    tie_cols: Sequence[str] = (),
    impl: str = "native",
) -> DataFrame:
    """Top-k rows of ``items`` nearest to a single probe vector.

    Mirrors the reference's ``MAX_RESULT = 5`` search
    (SSEOpenAIController.java:86,315-316).  ``probe`` may be a Python list
    (inlined as an array literal — no collect, no broadcast needed) or a
    Column.  ``tie_cols`` appends deterministic tie-breakers to the sort
    (Postgres leaves ties unspecified; tests avoid ties, SURVEY.md §7.5).
    """
    if isinstance(probe, Column):
        probe_col = probe
        guard = F.col(vec_col).isNotNull()
    else:
        probe_col = F.array(*[F.lit(float(x)).cast("float") for x in probe])
        # Null or wrong-dimension vectors produce NULL distances, which sort
        # FIRST under ascending order — they must never reach the heap.
        # (pgvector rejects them at insert; we enforce at query time too.)
        guard = F.col(vec_col).isNotNull() & (
            F.size(F.col(vec_col)) == len(probe)
        )
    if impl == "pandas":
        # NumPy scale path (SURVEY.md §4.3): one matrix op per Arrow batch
        # instead of interpreted per-element lambdas.  Summation order
        # differs from the native expression (pairwise vs left-to-right),
        # so oracle-checked queries stay on impl="native".
        if isinstance(probe, Column):
            raise ValueError("impl='pandas' requires a concrete probe vector")
        pdist = V.pandas_distance_udf(metric, [float(x) for x in probe])
        order = [F.col(dist_col).asc_nulls_last()]
        order += [F.col(c).asc() for c in tie_cols]
        return (
            items.filter(guard)
            .withColumn(dist_col, pdist(F.col(vec_col)))
            .orderBy(*order)
            .limit(k)
        )
    dist = distance_expr(metric, F.col(vec_col), probe_col)
    order = [_order_expr(metric, F.col(vec_col), probe_col).asc_nulls_last()]
    order += [F.col(c).asc() for c in tie_cols]
    # orderBy().limit(k) compiles to TakeOrderedAndProject — per-partition
    # heap, no global sort (SURVEY.md §4.1).
    return items.filter(guard).withColumn(dist_col, dist).orderBy(*order).limit(k)


def knn_join(
    probes: DataFrame,
    items: DataFrame,
    k: int = 5,
    metric: str = "l2",
    probe_id: str = "probe_id",
    item_id: str = "item_id",
    probe_vec: str = "embedding",
    item_vec: str = "embedding",
    dist_col: str = "dist",
    shuffle_free: bool = True,
    max_probe_rows: int = 100_000,
) -> DataFrame:
    """For every probe row, the k nearest item rows.

    Returns ``(probe_id, item_id, dist, rank)``.

    ``shuffle_free=True`` (default): a genuine two-stage bounded top-k.
    Stage 1 ships the probe matrix to every executor as a closure (probes
    are small by contract — the alternative broadcast join moves the same
    bytes) and selects each partition's top-k per probe inside one
    Arrow-batched ``mapInPandas`` pass: distances are one BLAS matmul per
    batch, and only k candidates per (partition, probe) ever leave the
    scan — nothing upstream of stage 2 buffers more than k rows per probe
    per partition.  Stage 2 is a k-bounded merge agg over those
    O(partitions x probes x k) candidate rows — the only exchange in the
    plan, and its volume is independent of item count.  (An earlier
    version tried ``slice(sort_array(collect_list))`` in a single agg,
    but Catalyst applies the slice only AFTER complete aggregation — the
    partial buffers and the exchange still carried every scored
    candidate, and the final agg materialized an O(n_items) array per
    probe on one reducer.)

    ``shuffle_free=False``: classic broadcast-crossJoin + window rank
    (shuffles every scored pair, all JVM-native — no Python workers).

    Measured (scripts/scale_probe.py, 32 probes x 500k items, local[32],
    quiet host): bounded two-stage ~7 s vs window ~14 s — the BLAS batch
    matmul beats per-pair interpreted HOF scoring even while the scored-
    pair shuffle still fits, and its exchange stays O(partitions x probes
    x k) no matter how large the item table grows (the 100 TB regime).
    The window form remains for environments without Python workers.

    Numerics note: stage 1 scores in NumPy float64 (BLAS pairwise sums),
    which can differ from the native left-to-right expression in the last
    ulp; outputs rounded to >=4 decimals are unaffected (verified against
    the DuckDB oracle by ``knn_join_l2``).
    """
    if shuffle_free:
        out = _bounded_topk_join(
            probes, items, k, metric, probe_id, item_id, probe_vec, item_vec,
            max_probe_rows=max_probe_rows,
        )
    else:
        p = probes.select(
            F.col(probe_id).alias("__pid"), F.col(probe_vec).alias("__pvec")
        )
        it = spread(
            items.select(
                F.col(item_id).alias("__iid"), F.col(item_vec).alias("__ivec")
            )
        )
        scored = it.join(F.broadcast(p)).withColumn(
            "__order", _order_expr(metric, F.col("__ivec"), F.col("__pvec"))
        )
        w = Window.partitionBy("__pid").orderBy(
            F.col("__order").asc(), F.col("__iid").asc()
        )
        out = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    dist = (
        F.sqrt(F.col("__order")) if metric == "l2" else F.col("__order")
    )
    # Output columns are always (probe_id, item_id, dist, rank) — the input
    # id column names (often both "vec_id" in a self-join) must not collide.
    return out.select(
        F.col("__pid").alias("probe_id"),
        F.col("__iid").alias("item_id"),
        dist.alias(dist_col),
        "rank",
    )


def _select_topk(vals: np.ndarray, ids: np.ndarray, k: int):
    """Deterministic top-k by ``(value, id)`` — argpartition cut (keeping
    every tie of the kth value), then an exact sort of the small survivor
    set."""
    n = len(vals)
    if n > k:
        part = np.argpartition(vals, k - 1)
        kth = vals[part[k - 1]]
        keep = np.flatnonzero(vals <= kth)
        vals, ids = vals[keep], ids[keep]
    order = sorted(range(len(vals)), key=lambda i: (vals[i], ids[i]))[:k]
    return vals[order], ids[order]


def _bounded_topk_join(
    probes: DataFrame,
    items: DataFrame,
    k: int,
    metric: str,
    probe_id: str,
    item_id: str,
    probe_vec: str,
    item_vec: str,
    max_probe_rows: int = 100_000,
) -> DataFrame:
    """Stage 1 of the shuffle-bounded kNN join: per-partition top-k per
    probe via ``mapInPandas`` (probe matrix as a closure, one BLAS matmul
    per Arrow batch, running top-k carried across batches), then stage 2:
    a k-bounded merge aggregation over O(partitions x probes x k) rows.

    Note this COLLECTS the probe side (it is small by contract, and a
    broadcast join would move the same bytes to every executor anyway) —
    the returned plan is therefore built eagerly with respect to probes.
    The contract is enforced: more than ``max_probe_rows`` probe rows
    raises instead of OOMing the driver.
    """
    rows = collect_bounded(
        probes,
        [probe_id, probe_vec],
        max_probe_rows,
        "knn_join",
        "For probe tables beyond this size, swap the roles (probe the"
        " smaller side) or batch the probes; the exchange stays bounded"
        " either way.",
    )
    pids = [r[0] for r in rows if r[1]]
    vecs = [r[1] for r in rows if r[1]]
    ptype = dict(probes.dtypes)[probe_id]
    itype = dict(items.dtypes)[item_id]
    if not pids:
        return probes.sparkSession.createDataFrame(
            [], f"__pid {ptype}, __iid {itype}, __order double, rank int"
        )
    P = np.asarray(vecs, dtype=np.float64)  # (n_probes, dim)
    dim = P.shape[1]
    if metric == "cosine":
        P = P / np.linalg.norm(P, axis=1, keepdims=True)
    p_sq = (P * P).sum(axis=1)

    it = spread(
        items.select(
            F.col(item_id).alias("__iid"), F.col(item_vec).alias("__ivec")
        )
    ).filter(F.col("__ivec").isNotNull() & (F.size("__ivec") == dim))

    n_probes = len(pids)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best_vals = [None] * n_probes
        best_ids = [None] * n_probes
        for pdf in batches:
            if pdf.empty:
                continue
            M = np.stack(pdf["__ivec"].to_numpy()).astype(np.float64, copy=False)
            iids = pdf["__iid"].to_numpy()
            if metric == "l2":
                d = (M * M).sum(axis=1)[:, None] - 2.0 * (M @ P.T) + p_sq[None, :]
                np.maximum(d, 0.0, out=d)  # expansion can dip below 0 in fp
            elif metric == "cosine":
                Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
                d = 1.0 - Mn @ P.T
            else:
                d = -(M @ P.T)
            for j in range(n_probes):
                if best_vals[j] is None:
                    vals, ids = d[:, j], iids
                else:
                    vals = np.concatenate([best_vals[j], d[:, j]])
                    ids = np.concatenate([best_ids[j], iids])
                best_vals[j], best_ids[j] = _select_topk(vals, ids, k)
        out_pid, out_iid, out_ord = [], [], []
        for j in range(n_probes):
            if best_vals[j] is None:
                continue
            out_pid.extend([pids[j]] * len(best_vals[j]))
            out_iid.extend(best_ids[j].tolist())
            out_ord.extend(best_vals[j].tolist())
        if out_pid:
            yield pd.DataFrame(
                {"__pid": out_pid, "__iid": out_iid, "__order": out_ord}
            )

    stage1 = it.mapInPandas(
        gen, schema=f"__pid {ptype}, __iid {itype}, __order double"
    )
    # Stage 2: merge the bounded candidate lists — the ONLY exchange, over
    # at most partitions x probes x k rows.  struct sorts lexicographically,
    # so (order, item_id) tie-breaks match stage 1's NumPy selection.
    cand = F.struct(F.col("__order").alias("o"), F.col("__iid").alias("i"))
    agg = stage1.groupBy("__pid").agg(
        F.slice(F.sort_array(F.collect_list(cand)), 1, k).alias("topk")
    )
    return agg.select("__pid", F.posexplode("topk").alias("pos", "c")).select(
        "__pid",
        F.col("c.i").alias("__iid"),
        F.col("c.o").alias("__order"),
        (F.col("pos") + 1).alias("rank"),
    )


def similarity_join(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    metric: str = "l2",
    left_id: str = "left_id",
    right_id: str = "right_id",
    left_vec: str = "embedding",
    right_vec: str = "embedding",
    dist_col: str = "dist",
    max_pairs: int | None = 100_000_000,
) -> DataFrame:
    """Range join: all pairs with distance < threshold (SURVEY.md §2B B2).

    Broadcast the smaller side when possible; the distance predicate is
    evaluated JVM-side so the filter runs inside the join's codegen stage.

    This exact form is O(|L| x |R|) scoring — matching the reference's
    exact-scan semantics (SSEOpenAIController.java:315-316) — and is
    GUARDED: when ``max_pairs`` is set (default 1e8), the pair count
    |L| x |R| is checked up front and an oversized join raises with a
    pointer at the scale path instead of silently running a cartesian
    scorer for hours (VERDICT r02 #1).  The two ``count()`` jobs are noise
    next to the scoring stage they bound.  For large self-joins use
    ``operators.ann.lsh_similarity_join`` (L2: candidate buckets + exact
    re-filter, recall-asserted vs this form) or MinHash/SimHash in
    ``operators.dedup`` for set similarity.  ``max_pairs=None`` disables
    the guard for callers that have already sized the inputs.
    """
    l = spread(
        left.select(F.col(left_id).alias("__lid"), F.col(left_vec).alias("__lvec"))
    )
    r = right.select(F.col(right_id).alias("__rid"), F.col(right_vec).alias("__rvec"))
    if max_pairs is not None:
        n_l, n_r = l.count(), r.count()
        if n_l * n_r > max_pairs:
            raise ValueError(
                f"similarity_join: exact all-pairs scoring of {n_l} x {n_r}"
                f" = {n_l * n_r} pairs exceeds max_pairs={max_pairs}."
                " Use operators.ann.lsh_similarity_join (L2) or"
                " operators.dedup's MinHash/SimHash paths, or pass"
                " max_pairs=None if the cartesian cost is intended."
            )
    if metric == "cosine":
        # Pre-normalize each side ONCE (norm as a projected scalar column so
        # the division doesn't re-evaluate the aggregate per element); the
        # per-pair expression then collapses to a single dot product instead
        # of dot + two norms — 3x less array work on the O(|L| x |R|) stage.
        l = (
            l.withColumn("__n", V.l2_norm("__lvec"))
            .withColumn(
                "__lvec",
                F.transform("__lvec", lambda x: x.cast("double") / F.col("__n")),
            )
            .drop("__n")
        )
        r = (
            r.withColumn("__n", V.l2_norm("__rvec"))
            .withColumn(
                "__rvec",
                F.transform("__rvec", lambda x: x.cast("double") / F.col("__n")),
            )
            .drop("__n")
        )
        order = F.lit(1.0) - V.dot_product(F.col("__lvec"), F.col("__rvec"))
    else:
        order = _order_expr(metric, F.col("__lvec"), F.col("__rvec"))
    thr = (
        F.lit(float(threshold)) ** 2 if metric == "l2" else F.lit(float(threshold))
    )
    dist = F.sqrt(F.col("__o")) if metric == "l2" else F.col("__o")
    return (
        l.join(F.broadcast(r))
        .withColumn("__o", order)
        .filter(F.col("__o") < thr)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            dist.alias(dist_col),
        )
    )
