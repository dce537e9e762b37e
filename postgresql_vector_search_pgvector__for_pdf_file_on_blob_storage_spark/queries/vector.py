"""Vector search — the reference hot path (SURVEY.md §2A row 13, §2B B1/B2) plus quantization mechanism oracles.

Mechanical split of the former single-file queries.py (round 9) — the
section bodies are verbatim; only relative-import depth changed.
"""

from __future__ import annotations

from ._core import *  # noqa: F401,F403


# ---------------------------------------------------------------------------
# Vector search — the reference's hot path (SURVEY.md §2A row 13, §2B B1/B2)
# ---------------------------------------------------------------------------

# DuckDB mirror of functions.vector expressions (same left-to-right double
# accumulation; `range(1, len+1)` is DuckDB's scalar list range).
_SQL_SQ_L2 = (
    "list_sum(list_transform(range(1, len({a})+1),"
    " i -> pow(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE), 2)))"
)

_SQL_DOT = (
    "list_sum(list_transform(range(1, len({a})+1),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)

_SQL_NORM = (
    "sqrt(list_sum(list_transform(range(1, len({a})+1),"
    " i -> pow(CAST({a}[i] AS DOUBLE), 2))))"
)

def _knn_query(metric: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        probe = emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("p")
        )
        # Probe side broadcast: the item scan never moves (100 TB shape).
        scored = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(probe))
        d = K.distance_expr(metric, F.col("embedding"), F.col("p"))
        return (
            scored.select("vec_id", "label", d.alias("__d"))
            .orderBy(F.col("__d").asc(), F.col("vec_id").asc())
            .limit(5)
            .select("vec_id", "label", F.round("__d", 4).alias("dist"))
        )

    return fn

def _knn_oracle(metric_expr: str) -> str:
    return f"""
WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, e.label, {metric_expr} AS d
  FROM embeddings e, probe p WHERE e.vec_id <> 0)
SELECT vec_id, label, round(d, 4) AS dist
FROM scored ORDER BY d ASC, vec_id ASC LIMIT 5
"""

query("knn_l2_top5", _knn_oracle(
    "sqrt(" + _SQL_SQ_L2.format(a="e.embedding", b="p.p") + ")"
))(_knn_query("l2"))

query("knn_cosine_top5", _knn_oracle(
    "1 - ("
    + _SQL_DOT.format(a="e.embedding", b="p.p")
    + " / ("
    + _SQL_NORM.format(a="e.embedding")
    + " * "
    + _SQL_NORM.format(a="p.p")
    + "))"
))(_knn_query("cosine"))

query("knn_dot_top5", _knn_oracle(
    "-(" + _SQL_DOT.format(a="e.embedding", b="p.p") + ")"
))(_knn_query("dot"))

@query(
    "knn_join_l2",
    f"""
WITH p AS (SELECT vec_id AS pid, embedding AS pe FROM embeddings WHERE vec_id < 10),
it AS (SELECT vec_id AS iid, embedding AS ie FROM embeddings WHERE vec_id >= 10),
scored AS (
  SELECT p.pid, it.iid, {_SQL_SQ_L2.format(a="it.ie", b="p.pe")} AS o
  FROM it, p),
ranked AS (
  SELECT pid, iid, o,
         row_number() OVER (PARTITION BY pid ORDER BY o ASC, iid ASC) AS rnk
  FROM scored)
SELECT pid AS probe_id, iid AS item_id, round(sqrt(o), 4) AS dist,
       CAST(rnk AS INTEGER) AS rank
FROM ranked WHERE rnk <= 3
""",
)
def knn_join_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN join (SURVEY.md §2B B2): 3 nearest items for each of 10 probes,
    via the shuffle-free bounded top-k aggregation in operators.knn."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    items = emb.filter(F.col("vec_id") >= 10)
    out = K.knn_join(
        probes, items, k=3, metric="l2", probe_id="vec_id", item_id="vec_id"
    )
    return out.select(
        F.col("probe_id"),
        F.col("item_id"),
        F.round("dist", 4).alias("dist"),
        F.col("rank").cast("int").alias("rank"),
    )

@query(
    "sq8_roundtrip",
    """
WITH pos_vals AS (
  SELECT unnest(range(1, len(embedding)+1)) AS pos,
         unnest(embedding) AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
params AS (
  SELECT pos,
         min(CAST(v AS DOUBLE)) AS mn,
         max(CAST(v AS DOUBLE)) AS mx
  FROM pos_vals GROUP BY pos
),
plist AS (
  SELECT list(mn ORDER BY pos) AS mins,
         list(CASE WHEN mx - mn > 0 THEN (mx - mn) / 255.0 ELSE 1.0 END
              ORDER BY pos) AS steps
  FROM params
),
enc AS (
  SELECT e.vec_id, e.embedding,
         list_transform(range(1, len(e.embedding)+1),
           i -> least(127, greatest(-128,
                CAST(round((CAST(e.embedding[i] AS DOUBLE) - p.mins[i])
                           / p.steps[i]) AS INTEGER) - 128))) AS code,
         p.mins AS mins, p.steps AS steps
  FROM embeddings e, plist p
  WHERE e.embedding IS NOT NULL
)
SELECT vec_id,
  CAST(list_sum(list_transform(range(1, len(code)+1),
       i -> (code[i] + 128) * i)) AS BIGINT) AS code_sum,
  CAST(list_min(code) AS INTEGER) AS code_min,
  CAST(list_max(code) AS INTEGER) AS code_max,
  list_max(list_transform(range(1, len(code)+1),
    i -> abs(CAST(embedding[i] AS DOUBLE)
             - ((CAST(code[i] AS DOUBLE) + 128.0) * steps[i] + mins[i]))))
    AS max_abs_err
FROM enc ORDER BY vec_id
""",
)
def sq8_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 encode/decode roundtrip through the REAL quantizer
    (operators/quant.SQ8, SURVEY.md §2B B16) with an integer-exact DuckDB
    twin: per-vector position-weighted code checksum (bit-exact — the
    whole fit+encode path is single IEEE ops both sides, and Spark's
    HALF_UP round equals DuckDB's half-away-from-zero round on the
    non-negative pre-shift codes), code min/max, and the max absolute
    reconstruction error (order-insensitive list max, micro-unit canon).
    This is the oracle coverage whose absence let the r5 codebook
    regression through the CORRECTNESS gate unnoticed (VERDICT r5 #3)."""
    from ..operators import quant as Qz

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    sq = Qz.SQ8(emb)
    enc = sq.encode(emb, code_col="code")
    dec = sq.dequantize(enc, code_col="code", out_col="recon")
    weights = F.sequence(F.lit(1), F.size("code"))
    weighted = F.zip_with(
        F.col("code"),
        weights,
        lambda c, i: (c.cast("int") + F.lit(128)) * i,
    )
    err = F.zip_with(
        F.col("embedding"),
        F.col("recon"),
        lambda v, r: F.abs(v.cast("double") - r),
    )
    return (
        dec.select(
            "vec_id",
            F.aggregate(
                weighted,
                F.lit(0).cast("long"),
                lambda acc, x: acc + x.cast("long"),
            ).alias("code_sum"),
            F.array_min("code").cast("int").alias("code_min"),
            F.array_max("code").cast("int").alias("code_max"),
            F.array_max(err).alias("max_abs_err"),
        )
        .orderBy("vec_id")
    )

@query(
    "pq_adc_fixed_codebook",
    """
WITH e AS (
  SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
),
jc AS (SELECT j, c FROM range(0, 2) t1(j), range(0, 8) t2(c)),
d AS (
  SELECT e.vec_id, jc.j, jc.c,
    list_sum(list_transform(range(0, 32), i ->
        (((jc.c*31 + i*17 + jc.j*7) % 19 - 9) / 9.0)
      * (((jc.c*31 + i*17 + jc.j*7) % 19 - 9) / 9.0)))
    - 2 * list_sum(list_transform(range(0, 32), i ->
        CAST(e.embedding[jc.j*32 + i + 1] AS DOUBLE)
      * (((jc.c*31 + i*17 + jc.j*7) % 19 - 9) / 9.0))) AS d2
  FROM e, jc
),
codes AS (
  SELECT vec_id, j, c FROM (
    SELECT vec_id, j, c,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c) AS rn
    FROM d) WHERE rn = 1
),
lut AS (
  SELECT jc.j, jc.c,
    list_sum(list_transform(range(0, 32), i ->
        (((jc.c*31 + i*17 + jc.j*7) % 19 - 9) / 9.0)
      * (((jc.c*31 + i*17 + jc.j*7) % 19 - 9) / 9.0)))
    - 2 * list_sum(list_transform(range(0, 32), i ->
        ((((jc.j*32 + i)*13) % 17 - 8) / 9.0)
      * (((jc.c*31 + i*17 + jc.j*7) % 19 - 9) / 9.0)))
    + list_sum(list_transform(range(0, 32), i ->
        ((((jc.j*32 + i)*13) % 17 - 8) / 9.0)
      * ((((jc.j*32 + i)*13) % 17 - 8) / 9.0))) AS ld
  FROM jc
)
SELECT c0.vec_id,
       CAST(c0.c AS INTEGER) AS code0,
       CAST(c1.c AS INTEGER) AS code1,
       round(l0.ld + l1.ld, 4) AS adc_dist
FROM codes c0
JOIN codes c1 ON c0.vec_id = c1.vec_id AND c0.j = 0 AND c1.j = 1
JOIN lut l0 ON l0.j = 0 AND l0.c = c0.c
JOIN lut l1 ON l1.j = 1 AND l1.c = c1.c
ORDER BY c0.vec_id
""",
)
def pq_adc_fixed_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode + ADC distance through the REAL quantizer paths
    (operators/quant.PQCodebook.encode / .search, SURVEY.md §2B B16)
    with FIXED formula-generated codebooks (``from_books`` — skipping
    k-means), so the argmin-encode and the asymmetric-distance lookup
    scan are DuckDB-expressible: the same move that gave SQ8 its oracle
    row (VERDICT r6 next-round #2).  Per item: both logical sub-space
    codes (integer-exact) and the full ADC distance to a fixed query
    (both sides compute the identical expanded form b.b - 2 v.b [+ q.q];
    round(4) absorbs the <=1e-12 summation-order delta).  ``search`` is
    driven with k = n so its mapInPandas partial-top-k scan emits every
    item — the oracle checks the whole scan, not just a boundary-stable
    prefix."""
    import numpy as np

    from ..operators import quant as Qz

    m, codes, dim = 2, 8, 64
    dsub = dim // m
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    books = np.array(
        [
            [
                [
                    ((c * 31 + i * 17 + j * 7) % 19 - 9) / 9.0
                    for i in range(dsub)
                ]
                for c in range(codes)
            ]
            for j in range(m)
        ]
    )
    pq = Qz.PQCodebook.from_books(books)
    enc = pq.encode(emb).cache()
    q = [((i * 13) % 17 - 8) / 9.0 for i in range(dim)]
    n = enc.count()
    hits = pq.search(enc, q, k=n, dist_col="adc_dist")
    code_cols = enc.select(
        "vec_id",
        (F.element_at("pq_code", 1).cast("int") + 128).alias("code0"),
        (F.element_at("pq_code", 2).cast("int") + 128).alias("code1"),
    )
    return (
        code_cols.join(hits, "vec_id")
        .select(
            "vec_id", "code0", "code1",
            F.round("adc_dist", 4).alias("adc_dist"),
        )
        .orderBy("vec_id")
    )

@query(
    "ivf_fixed_centroids",
    """
WITH e AS (
  SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
),
cents AS (
  SELECT c, list_transform(range(0, 64),
           i -> ((c*29 + i*11) % 23 - 11) / 11.0) AS cent
  FROM range(0, 8) t(c)
),
q AS (SELECT list_transform(range(0, 64),
        i -> ((i*13) % 17 - 8) / 9.0) AS qv),
-- knn() inlines a list probe as FLOAT literals (operators/knn.py:93), so
-- the scan-distance twin must round the query through binary32 first;
-- cluster pruning (probed) and assignment stay float64 like the engine.
qf AS (SELECT list_transform(range(0, 64),
        i -> CAST(CAST(((i*13) % 17 - 8) / 9.0 AS REAL) AS DOUBLE)) AS qv),
asg AS (
  SELECT vec_id, c AS cluster_id FROM (
    SELECT e.vec_id, cents.c,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_sum(list_transform(range(1, 65),
               i -> pow(CAST(e.embedding[i] AS DOUBLE) - cents.cent[i],
                        2))),
             cents.c) AS rn
    FROM e, cents) WHERE rn = 1
),
probed AS (
  SELECT c FROM (
    SELECT cents.c,
           row_number() OVER (ORDER BY
             list_sum(list_transform(range(1, 65),
               i -> pow(q.qv[i] - cents.cent[i], 2))), cents.c) AS rn
    FROM cents, q) WHERE rn <= 2
)
SELECT e.vec_id, CAST(asg.cluster_id AS INTEGER) AS cluster_id,
  round(sqrt(list_sum(list_transform(range(1, 65),
    i -> pow(CAST(e.embedding[i] AS DOUBLE) - qf.qv[i], 2)))), 4) AS dist
FROM e JOIN asg USING (vec_id) CROSS JOIN qf
WHERE asg.cluster_id IN (SELECT c FROM probed)
ORDER BY vec_id
""",
)
def ivf_fixed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF assignment + nprobe pruning + in-cluster exact scan through
    the REAL index paths (operators/ann.IVFIndex.from_centroids /
    .search, SURVEY.md §2B B3) with FIXED formula centroids, so the
    whole mechanism is DuckDB-expressible — the same move that gave PQ
    its oracle row (VERDICT r7 next-round #2; membership semantics in
    IVF can no longer hide behind rows-only + recall floors).  Output:
    every vector of the 2 probed clusters with its assigned cluster_id
    (integer-exact argmin, ties to lowest id both sides) and exact L2
    distance to the fixed query.  The oracle mirrors the engine's number
    paths EXACTLY, not approximately: assignment uses float64 centroid
    literals (ann.nearest_centroid_col), but ``knn`` inlines a list
    probe as FLOAT literals, so the twin's scan distance rounds the
    query through binary32 first (``qf`` CTE) — at sf0.1 one vector's
    distance straddles a 1e-4/2 rounding boundary between the f32 and
    f64 probes, which round(4) cannot absorb.  ``search`` is driven
    with k = n so its
    TakeOrderedAndProject emits the entire probed candidate set — the
    oracle checks assignment, pruning membership, AND the scan."""
    from ..operators import ann as A

    dim, n_clusters = 64, 8
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    cents = [
        [((c * 29 + i * 11) % 23 - 11) / 11.0 for i in range(dim)]
        for c in range(n_clusters)
    ]
    idx = A.IVFIndex.from_centroids(emb, cents)
    qv = [((i * 13) % 17 - 8) / 9.0 for i in range(dim)]
    n = emb.count()
    hits = idx.search(qv, k=n, nprobe=2)
    asg = idx.indexed.select(
        "vec_id", F.col("cluster_id").cast("int").alias("cluster_id")
    )
    return (
        hits.join(asg, "vec_id")
        .select(
            "vec_id", "cluster_id", F.round("dist", 4).alias("dist")
        )
        .orderBy("vec_id")
    )

@query(
    "ivfpq_fixed_books",
    """
WITH e AS (
  SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
),
cents AS (
  SELECT c, list_transform(range(0, 64),
           i -> ((c*29 + i*11) % 23 - 11) / 11.0) AS cent
  FROM range(0, 8) t(c)
),
q AS (SELECT list_transform(range(0, 64),
        i -> ((i*13) % 17 - 8) / 9.0) AS qv),
asg AS (
  SELECT vec_id, c AS cluster_id FROM (
    SELECT e.vec_id, cents.c,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_sum(list_transform(range(1, 65),
               i -> pow(CAST(e.embedding[i] AS DOUBLE) - cents.cent[i],
                        2))),
             cents.c) AS rn
    FROM e, cents) WHERE rn = 1
),
probed AS (
  SELECT c FROM (
    SELECT cents.c,
           row_number() OVER (ORDER BY
             list_sum(list_transform(range(1, 65),
               i -> pow(q.qv[i] - cents.cent[i], 2))), cents.c) AS rn
    FROM cents, q) WHERE rn <= 2
),
cand AS (
  SELECT e.vec_id, asg.cluster_id,
         list_transform(range(1, 65),
           i -> CAST(e.embedding[i] AS DOUBLE) - cents.cent[i]) AS r
  FROM e JOIN asg USING (vec_id)
  JOIN cents ON cents.c = asg.cluster_id
  WHERE asg.cluster_id IN (SELECT c FROM probed)
),
jc AS (SELECT j, c FROM range(0, 2) t1(j), range(0, 8) t2(c)),
dcode AS (
  SELECT cand.vec_id, jc.j, jc.c,
    list_sum(list_transform(range(0, 32), i ->
        (((jc.c*31 + i*17 + jc.j*7) % 19 - 9) / 9.0)
      * (((jc.c*31 + i*17 + jc.j*7) % 19 - 9) / 9.0)))
    - 2 * list_sum(list_transform(range(0, 32), i ->
        cand.r[jc.j*32 + i + 1]
      * (((jc.c*31 + i*17 + jc.j*7) % 19 - 9) / 9.0))) AS d2
  FROM cand, jc
),
codes AS (
  SELECT vec_id, j, c FROM (
    SELECT vec_id, j, c,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c) AS rn
    FROM dcode) WHERE rn = 1
),
lut AS (
  SELECT p.c AS pc, jc.j, jc.c AS code,
    list_sum(list_transform(range(0, 32), i ->
        (((jc.c*31 + i*17 + jc.j*7) % 19 - 9) / 9.0)
      * (((jc.c*31 + i*17 + jc.j*7) % 19 - 9) / 9.0)))
    - 2 * list_sum(list_transform(range(0, 32), i ->
        (q.qv[jc.j*32 + i + 1] - cents.cent[jc.j*32 + i + 1])
      * (((jc.c*31 + i*17 + jc.j*7) % 19 - 9) / 9.0)))
    + list_sum(list_transform(range(0, 32), i ->
        (q.qv[jc.j*32 + i + 1] - cents.cent[jc.j*32 + i + 1])
      * (q.qv[jc.j*32 + i + 1] - cents.cent[jc.j*32 + i + 1]))) AS ld
  FROM probed p JOIN cents ON cents.c = p.c CROSS JOIN jc CROSS JOIN q
),
adc AS (
  SELECT c0.vec_id, cand.cluster_id,
         CAST(c0.c AS INTEGER) AS code0, CAST(c1.c AS INTEGER) AS code1,
         l0.ld + l1.ld AS adc_d
  FROM codes c0
  JOIN codes c1 ON c0.vec_id = c1.vec_id AND c0.j = 0 AND c1.j = 1
  JOIN cand ON cand.vec_id = c0.vec_id
  JOIN lut l0 ON l0.pc = cand.cluster_id AND l0.j = 0 AND l0.code = c0.c
  JOIN lut l1 ON l1.pc = cand.cluster_id AND l1.j = 1 AND l1.code = c1.c
),
ex AS (
  SELECT cand.vec_id,
         sqrt(list_sum(list_transform(range(1, 65),
           i -> pow(CAST(e.embedding[i] AS DOUBLE) - q.qv[i], 2)))) AS exd
  FROM cand JOIN e USING (vec_id) CROSS JOIN q
)
SELECT a.vec_id, CAST(a.cluster_id AS INTEGER) AS cluster_id,
       a.code0, a.code1,
       round(a.adc_d, 4) AS adc_dist,
       round(ex.exd, 4) AS exact_dist,
       (row_number() OVER (ORDER BY ex.exd, a.vec_id) <= 5) AS top5
FROM adc a JOIN ex USING (vec_id)
ORDER BY a.vec_id
""",
)
def ivfpq_fixed_books(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED IVFADC+R path through the REAL index
    (operators/quant.IVFPQIndex.from_params — coarse assignment,
    per-cluster RESIDUAL PQ encode, nprobe pruning, per-cluster
    query-residual ADC lookup scan, exact refine) with FIXED formula
    coarse centroids (the ivf_fixed_centroids formula) and FIXED formula
    sub-codebooks (the pq_adc_fixed_codebook formula) — the
    fixed-parameters move applied to the composition itself, so
    ``ivfpq_search`` semantics no longer rest only on rows-only entries
    + recall floors (VERDICT r10 next-round #2).  Output: every vector
    of the 2 probed clusters with its coarse cluster (integer argmin),
    both residual PQ codes (integer argmin over the residual — what
    makes IVFPQ distances valid: ``||q-x||^2 = ||(q-c)-r||^2``), the ADC
    distance from the probe's per-cluster residual LUT, the exact L2 to
    the probe, and the refined top-5 flag from the real
    ``search(refine_items=...)`` call (ties broken on id both sides).
    ``shortlist=n`` drives the ADC scan over the whole candidate set so
    the oracle checks membership + codes + both distance paths with no
    float-boundary sensitivity; the k=5 refine then exercises the
    production composition exactly."""
    import numpy as np

    from ..operators import quant as Qz

    m, codes, dim, kc = 2, 8, 64, 8
    dsub = dim // m
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    cents = [
        [((c * 29 + i * 11) % 23 - 11) / 11.0 for i in range(dim)]
        for c in range(kc)
    ]
    books = np.array(
        [
            [
                [
                    ((c * 31 + i * 17 + j * 7) % 19 - 9) / 9.0
                    for i in range(dsub)
                ]
                for c in range(codes)
            ]
            for j in range(m)
        ]
    )
    idx = Qz.IVFPQIndex.from_params(emb, cents, books)
    qv = [((i * 13) % 17 - 8) / 9.0 for i in range(dim)]
    n = emb.count()
    adc = idx.search(qv, k=n, nprobe=2, shortlist=n, dist_col="adc_d")
    exact = idx.search(
        qv, k=n, nprobe=2, shortlist=n, refine_items=emb, dist_col="exd"
    )
    top_ids = [
        r["vec_id"]
        for r in idx.search(
            qv, k=5, nprobe=2, shortlist=n, refine_items=emb
        ).select("vec_id").collect()
    ]
    code_cols = idx.indexed.select(
        "vec_id",
        F.col("cluster_id").cast("int").alias("cluster_id"),
        (F.element_at("pq_code", 1).cast("int") + 128).alias("code0"),
        (F.element_at("pq_code", 2).cast("int") + 128).alias("code1"),
    )
    return (
        code_cols.join(adc, "vec_id")
        .join(exact, "vec_id")
        .select(
            "vec_id", "cluster_id", "code0", "code1",
            F.round("adc_d", 4).alias("adc_dist"),
            F.round("exd", 4).alias("exact_dist"),
            F.col("vec_id").isin(top_ids).alias("top5"),
        )
        .orderBy("vec_id")
    )
