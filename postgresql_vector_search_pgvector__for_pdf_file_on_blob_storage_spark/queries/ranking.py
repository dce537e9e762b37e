"""Retrieval-side closure: BM25 keyword ranking, hybrid RRF fusion, decontamination (operators/ranking.py).

Mechanical split of the former single-file queries.py (round 9) — the
section bodies are verbatim; only relative-import depth changed.
"""

from __future__ import annotations

from ._core import *  # noqa: F401,F403
from .vector import _SQL_DOT, _SQL_NORM  # noqa: F401


# ---------------------------------------------------------------------------
# Retrieval-side closure: BM25 keyword ranking, hybrid BM25+vector fusion,
# benchmark decontamination (operators/ranking.py).  The reference ranks by
# vector distance only (SSEOpenAIController.java:315-316); these add the
# lexical ranker and fusion every production RAG stack pairs with it, and
# the eval-overlap filter every training-data pipeline needs.
# ---------------------------------------------------------------------------

# Query terms for the lexical ranker fixtures (all present in the corpus
# vocabulary with distinct document frequencies).
_BM25_TERMS = ["vector", "hash", "window", "spark"]

# DuckDB mirror of operators/ranking.bm25_scores — identical parse trees:
# idf is snapped to 6 decimals (ln differs by <=1 ulp between engines), the
# per-term products are summed through DECIMAL(18,6), and the BM25
# constants appear as the exact repr of the Python-side doubles
# (1.2 + 1.0 == 2.2 bitwise; 1.0 - 0.75 == 0.25 exactly).
_SQL_BM25_RANKS = r"""
toks AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> x <> ''))
              AS BIGINT) AS dl,
         unnest(list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> x <> ''))
           AS token
  FROM documents),
bmstats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CAST(len(list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'),
                                       x -> x <> '')) AS BIGINT)) AS BIGINT)
           AS sum_dl
  FROM documents),
tf AS (
  SELECT doc_id, token, dl, CAST(count(*) AS BIGINT) AS tf
  FROM toks
  WHERE token IN ('vector', 'hash', 'window', 'spark')
  GROUP BY doc_id, token, dl),
dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
bmscored AS (
  SELECT t.doc_id,
         round(ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE)
                         + 0.5) / (CAST(d.df AS DOUBLE) + 0.5)), 6)
         * ((CAST(t.tf AS DOUBLE) * 2.2)
            / (CAST(t.tf AS DOUBLE)
               + 1.2 * (0.25 + 0.75 * (CAST(t.dl AS DOUBLE)
                                       / (CAST(s.sum_dl AS DOUBLE)
                                          / CAST(s.n_docs AS DOUBLE))))))
           AS part
  FROM tf t JOIN dfreq d ON t.token = d.token CROSS JOIN bmstats s),
bmagg AS (
  SELECT doc_id, (CAST(CAST(sum(CAST(part AS DECIMAL(18,6))) - (sum(CAST(part AS DECIMAL(18,6))) % 1) AS BIGINT) AS DOUBLE) + CAST(sum(CAST(part AS DECIMAL(18,6))) % 1 AS DOUBLE)) AS score
  FROM bmscored GROUP BY doc_id),
bmranked AS (
  SELECT doc_id, score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
              AS INTEGER) AS rank
  FROM bmagg)
"""

@query(
    "bm25_keyword_search",
    "WITH " + _SQL_BM25_RANKS + """
SELECT doc_id, score, rank FROM bmranked
WHERE rank <= 10 ORDER BY rank
""",
)
def bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 BM25 keyword ranking over the corpus (operators/ranking.py).

    100 TB plan shape: the exploded token stream is filtered to the query
    terms BEFORE the one (doc, term) shuffle; corpus stats and per-term
    document frequencies travel as broadcasts; the final ranking is
    ``TakeOrderedAndProject`` over per-document scores with the
    ``row_number`` applied to the bounded top set only."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return R.bm25_search(docs, "text", "doc_id", _BM25_TERMS, k=10).select(
        "doc_id", "score", "rank"
    )

@query(
    "hybrid_rrf_search",
    "WITH " + _SQL_BM25_RANKS + f""",
vscored AS (
  SELECT e.vec_id AS doc_id,
         {_SQL_DOT.format(a="e.embedding", b="p.embedding")}
           / ({_SQL_NORM.format(a="e.embedding")}
              * {_SQL_NORM.format(a="p.embedding")}) AS sim
  FROM embeddings e
  CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) p),
vranked AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY sim DESC, doc_id ASC) AS INTEGER)
           AS rank
  FROM vscored),
bmtop AS (SELECT doc_id, rank FROM bmranked WHERE rank <= 50),
vtop AS (SELECT doc_id, rank FROM vranked WHERE rank <= 50),
fused AS (
  SELECT coalesce(b.doc_id, v.doc_id) AS doc_id,
         (CASE WHEN b.rank IS NOT NULL
               THEN 1.0 / (60.0 + CAST(b.rank AS DOUBLE)) ELSE 0.0 END
          + CASE WHEN v.rank IS NOT NULL
                 THEN 1.0 / (60.0 + CAST(v.rank AS DOUBLE)) ELSE 0.0 END)
           AS rrf_score,
         b.rank AS bm25_rank, v.rank AS vec_rank
  FROM bmtop b FULL OUTER JOIN vtop v ON b.doc_id = v.doc_id)
SELECT doc_id, rrf_score, bm25_rank, vec_rank
FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
""",
)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-50 and cosine top-50 fused with
    reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009:
    ``sum 1/(60+rank)``), top-10 out.  The embeddings table doubles as the
    per-document vector column (vec_id == doc_id).

    Both source rankings are rank-bounded before the fusion join, so the
    full-outer join sees at most ``2*pool`` rows regardless of corpus
    size; the vector side broadcasts the 1-row probe against the item
    scan exactly like the kNN operators."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    emb = load_table(spark, sf_dir, "embeddings")
    bm = R.bm25_search(docs, "text", "doc_id", _BM25_TERMS, k=50)
    probe = emb.filter(F.col("vec_id") == 0)
    vec = R.cosine_ranks(
        emb.withColumnRenamed("vec_id", "doc_id"),
        "embedding",
        "doc_id",
        probe,
        "embedding",
        pool=50,
    )
    return R.rrf_fuse(bm, vec, "doc_id", k=60, top=10).select(
        "doc_id",
        "rrf_score",
        F.col("rank_a").alias("bm25_rank"),
        F.col("rank_b").alias("vec_rank"),
    )

@query(
    "decontamination_overlap",
    r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> x <> '') AS t
  FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 3, 0) + 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
           AS shingles
  FROM toks),
ev AS (SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 25 = 0),
tr AS (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 25 <> 0),
tot AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_grams
        FROM sh WHERE doc_id % 25 <> 0),
hit AS (SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_shared
        FROM tr JOIN ev ON tr.s = ev.s GROUP BY tr.doc_id)
SELECT t.doc_id, t.n_grams, h.n_shared,
       CAST(h.n_shared AS DOUBLE) / CAST(t.n_grams AS DOUBLE)
         AS contamination
FROM tot t JOIN hit h ON t.doc_id = h.doc_id
ORDER BY contamination DESC, t.doc_id
""",
)
def decontamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (training-data pipeline staple): flag
    training documents sharing distinct word 4-grams with a held-out
    benchmark slice (every 25th doc stands in for the eval set).  The
    benchmark shingle set is broadcast — the training side is one explode +
    semi-join + per-doc count, no pairwise work (operators/ranking.py)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    train = docs.filter(F.col("doc_id") % 25 != 0)
    return R.decontaminate(train, bench, "text", "doc_id", n=4)
