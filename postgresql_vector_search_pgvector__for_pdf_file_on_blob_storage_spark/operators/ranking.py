"""Keyword (BM25) ranking, hybrid BM25+vector fusion, and benchmark
decontamination — the retrieval-side closure of the reference's search path.

The reference ranks results by vector distance only
(``SSEOpenAIController.java:315-316`` — ``ORDER BY embedding <-> ?::vector
LIMIT 5``).  Production RAG stacks pair that with a lexical ranker (BM25)
and fuse the two rankings (reciprocal-rank fusion); large-scale training
pipelines additionally need *decontamination* — dropping training documents
that share long n-grams with an evaluation/benchmark set.  All three are
implemented here as native DataFrame expressions (no Python in the hot
path) and mirrored by DuckDB oracles in the ``queries`` package.

Cross-engine float determinism follows the repo-wide rules
(``driver_registry`` module doc): per-term BM25 contributions are summed
through ``DECIMAL(18,6)`` (order-independent), the idf is rounded to 6
decimals to absorb sub-ulp ``ln`` differences between libm and the JVM,
and every other float expression is a fixed parse tree of single IEEE ops
over exact integer inputs.

Scale notes (100 TB):

- BM25 filters the exploded token stream to the query terms *before* the
  per-document aggregate, so the one shuffle carries only candidate
  (doc, term) rows — the corpus-wide token stream never shuffles.  Corpus
  stats (N, total token count) come from a map-side-combined single-row
  aggregate that is broadcast, and the per-term document frequencies are a
  broadcast of at most ``len(terms)`` rows.
- Rank assignment materializes only the global top ``pool`` rows via
  ``orderBy().limit()`` (``TakeOrderedAndProject`` — per-partition heaps,
  no full sort), then applies ``row_number`` to that bounded set.
- Decontamination broadcasts the *benchmark* shingle set (benchmarks are
  tiny next to training corpora) and left-semi joins the training shingles
  against it — one pass over the training side, no pairwise comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as X
from ..functions import vector as V
from .dedup import word_shingles

_DEC = "decimal(18,6)"


def _dsum(c: Column) -> Column:
    """Exact order-independent sum of a double expression.  The decimal ->
    double conversion uses the truncated-int + fraction split (mirroring
    queries._dec_to_double and the oracle SQL): a direct cast diverges
    between engines once the sum's integer units pass 2^53."""
    s = F.sum(c.cast(_DEC))
    return (s - (s % 1)).cast("bigint").cast("double") + (s % 1).cast(
        "double"
    )


def bm25_scores(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for a bag of query ``terms``.

    Lucene-style formula per (document, term)::

        idf  = ln(1 + (N - df + 0.5) / (df + 0.5))
        tf'  = (tf * (k1+1)) / (tf + k1 * ((1-b) + b * (dl / avgdl)))
        score(d) = sum over matched terms of idf * tf'

    where ``N`` is the corpus document count, ``df`` the term's document
    frequency, ``dl`` the document token length and ``avgdl`` its corpus
    mean.  Only documents matching at least one term are returned.
    """
    toks = docs.select(
        F.col(id_col),
        X.token_count(text_col).cast("long").alias("dl"),
        F.explode(X.word_tokens(text_col)).alias("token"),
    )
    # Corpus stats over ALL documents (including zero/no-match ones): a
    # map-side single-row aggregate, broadcast below.
    stats = docs.select(X.token_count(text_col).cast("long").alias("dl")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    # Keep only query-term tokens BEFORE any shuffle (predicate sits right
    # above the explode, so the corpus token stream is never exchanged).
    tf = (
        toks.filter(F.col("token").isin(terms))
        .groupBy(id_col, "token", "dl")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count("*").cast("long").alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
    )
    n_d = F.col("n_docs").cast("double")
    df_d = F.col("df").cast("double")
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    avgdl = F.col("sum_dl").cast("double") / n_d
    # round(..., 6): ln differs by <=1 ulp between the JVM and libm; the
    # 6-decimal snap makes both engines agree (see module doc).
    idf = F.round(
        F.log(F.lit(1.0) + (n_d - df_d + F.lit(0.5)) / (df_d + F.lit(0.5))), 6
    )
    tf_part = (tf_d * F.lit(k1 + 1.0)) / (
        tf_d + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dl_d / avgdl))
    )
    return scored.groupBy(id_col).agg(
        _dsum(idf * tf_part).alias("score")
    )


def bm25_search(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` BM25 ranking: ``(id, score, rank)``, ties broken by id.

    ``orderBy().limit(k)`` plans as ``TakeOrderedAndProject``; the
    ``row_number`` then runs over at most ``k`` rows (bounded, never a
    corpus-wide single-partition sort).
    """
    top = (
        bm25_scores(docs, text_col, id_col, terms, k1=k1, b=b)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def rrf_fuse(
    ranks_a: DataFrame,
    ranks_b: DataFrame,
    id_col: str,
    k: int = 60,
    top: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of two rankings (columns ``id_col, rank``).

    ``rrf = 1/(k + rank_a) + 1/(k + rank_b)`` with an absent ranking
    contributing 0.  Output: ``(id, rrf_score, rank_a, rank_b)`` — the
    source ranks stay visible (NULL where unranked).
    """
    a = ranks_a.select(F.col(id_col), F.col("rank").alias("rank_a"))
    bdf = ranks_b.select(F.col(id_col), F.col("rank").alias("rank_b"))
    fused = a.join(bdf, id_col, "full_outer")
    contrib_a = F.when(
        F.col("rank_a").isNotNull(),
        F.lit(1.0) / (F.lit(float(k)) + F.col("rank_a").cast("double")),
    ).otherwise(F.lit(0.0))
    contrib_b = F.when(
        F.col("rank_b").isNotNull(),
        F.lit(1.0) / (F.lit(float(k)) + F.col("rank_b").cast("double")),
    ).otherwise(F.lit(0.0))
    return (
        fused.select(
            F.col(id_col),
            (contrib_a + contrib_b).alias("rrf_score"),
            F.col("rank_a").cast("int"),
            F.col("rank_b").cast("int"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(top)
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
) -> DataFrame:
    """Flag training documents sharing word ``n``-grams with a benchmark.

    Returns ``(id, n_grams, n_shared, contamination)`` for every training
    document with at least one shared distinct n-gram, ordered worst-first.
    ``contamination = n_shared / n_grams`` over *distinct* n-grams.

    The benchmark shingle set is broadcast (eval sets are small by
    construction); the training side is one explode + semi-join + count —
    a single shuffle keyed by document id, no pairwise work.
    """
    sh = train.select(
        F.col(id_col), word_shingles(text_col, n).alias("shingles")
    )
    bench_grams = (
        benchmark.select(
            F.explode(word_shingles(text_col, n)).alias("gram")
        ).distinct()
    )
    tr_grams = sh.select(id_col, F.explode("shingles").alias("gram"))
    shared = (
        tr_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    totals = sh.select(
        id_col, F.size("shingles").cast("long").alias("n_grams")
    )
    return (
        totals.join(shared, id_col)
        .select(
            id_col,
            "n_grams",
            "n_shared",
            (
                F.col("n_shared").cast("double")
                / F.col("n_grams").cast("double")
            ).alias("contamination"),
        )
        .orderBy(F.desc("contamination"), F.asc(id_col))
    )


def cosine_ranks(
    items: DataFrame,
    vec_col: str,
    id_col: str,
    probe: DataFrame,
    probe_col: str,
    pool: int = 50,
) -> DataFrame:
    """Top-``pool`` cosine-similarity ranking against a 1-row probe:
    ``(id, rank)`` with ties broken by id.  The probe side is broadcast so
    the item scan never moves (same shape as the kNN operators)."""
    sim = V.cosine_similarity(F.col(vec_col), F.col("__p"))
    top = (
        items.crossJoin(F.broadcast(probe.select(F.col(probe_col).alias("__p"))))
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(pool)
    )
    w = Window.orderBy(F.desc("sim"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        id_col, "rank"
    )
