"""Dedup & text analysis (SURVEY.md §2B B4-B6 + training-data ops).

Mechanical split of the former single-file queries.py (round 9) — the
section bodies are verbatim; only relative-import depth changed.
"""

from __future__ import annotations

from ._core import *  # noqa: F401,F403
from .relational import _dsum  # noqa: F401


# ---------------------------------------------------------------------------
# Dedup & text analysis (SURVEY.md §2B B4-B6 + training-data ops)
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    r"""
SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS dup_count
FROM documents
GROUP BY regexp_replace(replace(text, chr(10), ' '), '\s{2,}', ' ', 'g')
ORDER BY keep_id
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text (SURVEY.md §2B B4).  Spark groups on a
    64-bit fingerprint (xxhash64) instead of the full text — an 8-byte
    shuffle key at 100 TB; the oracle groups on the text itself (same
    partition of rows, engine-specific key)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        D.exact_dedup(docs, "text", "doc_id")
        .select("keep_id", "dup_count")
        .orderBy("keep_id")
    )

@query(
    "token_stats",
    r"""
WITH t AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents)
SELECT doc_id, n_chars, n_tokens,
       CAST(n_chars AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), 1.0) AS mean_token_len
FROM t ORDER BY doc_id
""",
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + mean token length (SURVEY.md §2B B6)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    n_chars = F.length("text").cast("long")
    n_tokens = X.token_count("text").cast("long")
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (
            n_chars.cast("double")
            / F.greatest(n_tokens.cast("double"), F.lit(1.0))
        ).alias("mean_token_len"),
    ).orderBy("doc_id")

@query(
    "token_frequencies_top100",
    r"""
SELECT token, CAST(count(*) AS BIGINT) AS freq
FROM (
  SELECT unnest(list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> x <> '')) AS token
  FROM documents)
GROUP BY token ORDER BY freq DESC, token LIMIT 100
""",
)
def token_frequencies_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word-count (explode -> partial agg -> top-k)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(X.word_tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(100)
    )

@query(
    "lang_distribution",
    """
SELECT lang, CAST(count(*) AS BIGINT) AS n,
  (CAST(CAST(sum(CAST(n_chars AS DECIMAL(18,6))) - (sum(CAST(n_chars AS DECIMAL(18,6))) % 1) AS BIGINT) AS DOUBLE) + CAST(sum(CAST(n_chars AS DECIMAL(18,6))) % 1 AS DOUBLE)) / count(*) AS avg_chars
FROM documents GROUP BY lang ORDER BY lang
""",
)
def lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language histogram over the labeled corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            (_dsum(F.col("n_chars").cast("double")) / F.count("*")).alias(
                "avg_chars"
            ),
        )
        .orderBy("lang")
    )

@query(
    "order_price_percentiles",
    """
SELECT o_orderstatus,
  quantile_cont(o_totalprice, 0.5) AS p50,
  quantile_cont(o_totalprice, 0.9) AS p90,
  quantile_cont(o_totalprice, 0.99) AS p99,
  CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (SURVEY.md §2B B7 depth).
    Spark ``percentile`` and DuckDB ``quantile_cont`` share the
    sort-then-interpolate definition, and the interpolation is a single
    IEEE op on two doubles — engine-independent.  (Exact percentile sorts
    within groups; at 100 TB switch to ``approx_percentile``, which is
    mergeable and single-pass but not oracle-matchable.)"""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", 0.5).alias("p50"),
            F.percentile("o_totalprice", 0.9).alias("p90"),
            F.percentile("o_totalprice", 0.99).alias("p99"),
            F.count("*").cast("long").alias("n"),
        )
        .orderBy("o_orderstatus")
    )

@query(
    "array_functions_gallery",
    r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id,
  array_to_string(toks[1:3], '-') AS first3,
  CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
  list_contains(toks, 'the') AS has_the,
  list_sort(toks)[1] AS alpha_first,
  CAST(list_max(list_transform(toks, x -> length(x))) AS INTEGER) AS longest
FROM t ORDER BY doc_id
""",
)
def array_functions_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function library sample (SURVEY.md §2B B12): slice/join,
    distinct, membership, ordering, nested transform — all native
    expressions over the tokenized corpus."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = X.word_tokens("text")
    return docs.select(
        "doc_id",
        F.array_join(F.slice(toks, 1, 3), "-").alias("first3"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_distinct"),
        F.array_contains(toks, "the").alias("has_the"),
        F.array_min(toks).alias("alpha_first"),
        F.array_max(F.transform(toks, F.length)).cast("int").alias("longest"),
    ).orderBy("doc_id")

@query(
    "bpe_token_stats",
    r"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, ' ?\p{L}+| ?\p{N}+| ?[^ \t\n\r\f\x0B\p{L}\p{N}]+|[ \t\n\r\f\x0B]+')) AS BIGINT) AS n_bpe_tokens,
  CAST(len(list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> x <> '')) AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, ' ?\p{L}+| ?\p{N}+| ?[^ \t\n\r\f\x0B\p{L}\p{N}]+|[ \t\n\r\f\x0B]+')) AS DOUBLE)
    / greatest(CAST(len(list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> x <> '')) AS DOUBLE), 1.0)
    AS bpe_per_ws
FROM documents ORDER BY doc_id
""",
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, BPE-ish regex flavor (brief training-data ops) next
    to the whitespace count — the pattern is RE2-safe so Spark (Java regex)
    and DuckDB (RE2) extract identical token streams."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    n_bpe = X.bpe_token_count("text").cast("long")
    n_ws = X.token_count("text").cast("long")
    return docs.select(
        "doc_id",
        n_bpe.alias("n_bpe_tokens"),
        n_ws.alias("n_ws_tokens"),
        (
            n_bpe.cast("double")
            / F.greatest(n_ws.cast("double"), F.lit(1.0))
        ).alias("bpe_per_ws"),
    ).orderBy("doc_id")

@query(
    "deterministic_sample_per_lang",
    """
WITH keyed AS (
  SELECT doc_id, lang,
         (((doc_id % 1000003) * 2654435761
           + (doc_id // 1000003) * 97) % 4294967296) % 100 AS bucket
  FROM documents)
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_sampled,
  CAST(min(doc_id) AS BIGINT) AS first_doc
FROM keyed WHERE bucket < 10
GROUP BY lang ORDER BY lang
""",
)
def deterministic_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample via multiplicative hashing on the key
    (training-data pipelines need reproducible samples; seeded RNG sampling
    differs per engine/partitioning, key-hash sampling does not and needs
    no coordination at 100 TB — any worker can decide membership from the
    key alone).  The key is split mod 1000003 before multiplying so the
    largest intermediate is ~2.7e15 — no BIGINT overflow for any int64
    doc_id, on either engine."""
    docs = load_table(spark, sf_dir, "documents")
    lo = F.col("doc_id") % F.lit(1000003)
    hi = F.expr("doc_id div 1000003")  # exact BIGINT division (no double)
    bucket = (
        (lo * F.lit(2654435761) + hi * F.lit(97)) % F.lit(4294967296)
    ) % F.lit(100)
    return (
        docs.filter(bucket < 10)
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
        .orderBy("lang")
    )

# English stopword probe set for the quality-scoring heuristic (brief:
# "length/punct/stopword ratios").  Kept tiny and fixed so the DuckDB
# oracle can inline the identical list.
_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

@query(
    "doc_quality_scores",
    r"""
WITH t AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> x <> '') AS toks,
         length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit
  FROM documents),
s AS (
  SELECT doc_id, n_chars, CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(toks, x ->
           list_contains(['the','a','an','and','or','of','to','in','is','it'],
                         lower(x)))) AS BIGINT) AS n_stop,
         n_punct, n_digit
  FROM t)
SELECT doc_id, n_chars, n_tokens,
       CAST(n_chars AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), 1.0) AS mean_token_len,
       CAST(n_punct AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0) AS punct_ratio,
       CAST(n_digit AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0) AS digit_ratio,
       CAST(n_stop AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), 1.0) AS stopword_ratio
FROM s ORDER BY doc_id
""",
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring for training-data filtering (brief
    training-data ops; generalizes SURVEY.md §2A rows 15-17): char/token
    counts, mean token length, punctuation/digit/stopword ratios.  Pure
    scan — every column is a native expression, no shuffle."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = X.word_tokens("text")
    n_tokens = F.size(toks).cast("long")
    n_stop = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(_STOPWORDS))
    ).cast("long")
    return docs.select(
        "doc_id",
        *X.quality_metrics("text"),
        (
            n_stop.cast("double")
            / F.greatest(n_tokens.cast("double"), F.lit(1.0))
        ).alias("stopword_ratio"),
    ).orderBy("doc_id")

@query(
    "doc_rolling_fingerprints",
    r"""
WITH c AS (
  SELECT doc_id, length(text) AS n,
         list_transform(string_split(text, ''),
                        ch -> CAST(ascii(ch) AS BIGINT)) AS codes
  FROM documents)
SELECT doc_id,
  list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
              (acc, x) -> (acc*131 + x) % 1000000007) AS fp_full,
  CASE WHEN n >= 8 THEN
    list_min(list_transform(range(1, n - 8 + 2),
      i -> list_reduce(list_prepend(CAST(0 AS BIGINT), codes[i:i+7]),
           (acc, x) -> (acc*131 + x) % 1000000007)))
  ELSE
    list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
                (acc, x) -> (acc*131 + x) % 1000000007)
  END AS fp_min
FROM c ORDER BY doc_id
""",
)
def doc_rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting (brief training-data ops):
    full-text Rabin–Karp hash + winnowing-style min over 8-char windows.
    Both values are exact integers, so the oracle matches bit-for-bit.

    Runs the NumPy pandas-UDF form (one strided matmul per doc) — the
    native higher-order ``aggregate`` twin folds per character through the
    interpreter and measured ~100x slower at fixture scale; equality of the
    two is pinned in tests/test_text.py.  ``spread`` first: the fixture is
    a single parquet file — one partition would serialize the scan."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    fp = X.rolling_fingerprint_udf(k=8)(F.col("text"))
    return docs.select(
        "doc_id", fp["fp_full"].alias("fp_full"), fp["fp_min"].alias("fp_min")
    ).orderBy("doc_id")

@query(
    "jaccard_similar_pairs",
    r"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> x <> '') AS t
  FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
  FROM toks),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
dfreq AS (SELECT s, count(*) AS df FROM ex GROUP BY s),
elig AS (SELECT e.doc_id, e.s FROM ex e JOIN dfreq d ON e.s = d.s
         WHERE d.df <= 5),
na AS (SELECT doc_id, count(*) AS n_sh FROM elig GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM elig a JOIN elig b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT p.id_a, p.id_b,
       CAST(p.inter AS DOUBLE) / (x.n_sh + y.n_sh - p.inter) AS jaccard
FROM pairs p
JOIN na x ON p.id_a = x.doc_id
JOIN na y ON p.id_b = y.doc_id
WHERE CAST(p.inter AS DOUBLE) / (x.n_sh + y.n_sh - p.inter) >= 0.8
ORDER BY p.id_a, p.id_b
""",
)
def jaccard_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs (SURVEY.md §2B B5) via the
    shingle equi-join (no n^2), with the hot-shingle document-frequency cap
    engaged (``max_df=5`` — binding on this corpus: fixture shingle df
    reaches 7) so the 100 TB guard itself is oracle-verified.  The oracle
    mirrors the capped universe exactly."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        D.jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.8, max_df=5)
        .orderBy("id_a", "id_b")
    )

@query(
    "ngram_dup_stats",
    r"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> x <> '') AS t
  FROM documents),
w AS (
  SELECT doc_id, CAST(greatest(len(t) - 7, 0) AS BIGINT) AS n_windows,
         list_distinct(list_transform(range(1, greatest(len(t) - 7, 0) + 1),
                       i -> array_to_string(t[i:i+7], ' '))) AS grams
  FROM toks),
g AS (SELECT doc_id, unnest(grams) AS gram FROM w),
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
per AS (SELECT g.doc_id, count(*) AS n_dup FROM g JOIN dup USING (gram)
        GROUP BY g.doc_id)
SELECT w.doc_id AS doc_id,
       w.n_windows,
       CAST(len(grams) AS BIGINT) AS n_grams,
       CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_grams,
       CAST(CASE WHEN len(grams) > 0
            THEN (coalesce(p.n_dup, 0) * 1000000) // len(grams)
            ELSE 0 END AS BIGINT) AS dup_gram_ppm
FROM w LEFT JOIN per p ON w.doc_id = p.doc_id
ORDER BY w.doc_id
""",
)
def ngram_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication signal (operators.dedup.ngram_dup_stats
    — Lee et al. 2022 exact-substring dedup, re-expressed as two hash
    shuffles over 64-bit gram keys instead of a corpus suffix array).
    Catches boilerplate spans shared across otherwise-distinct documents,
    which doc-level exact/MinHash dedup misses.  The duplicated fraction is
    exact BIGINT ppm (never a formatted double — dyadic rule,
    driver_registry.py).  Oracle groups the gram *strings*; Spark shuffles
    xxhash64 keys — identical absent 64-bit collisions (fixture G ~ 2e4
    grams -> p < 1e-11)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_dup_stats(docs, n=8).orderBy("doc_id")

@query(
    "unigram_surprisal",
    r"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> x <> '')) AS token
  FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
freq AS (SELECT token, sum(tf) AS freq FROM tf GROUP BY token),
tot AS (SELECT sum(freq) AS total FROM freq),
per AS (
  SELECT tf.doc_id,
         sum(tf.tf) AS n_tokens,
         sum(tf.tf * (length(bin(CAST(t.total // f.freq AS BIGINT))) - 1))
           AS bits
  FROM tf JOIN freq f USING (token) CROSS JOIN tot t
  GROUP BY tf.doc_id)
SELECT d.doc_id AS doc_id,
       CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(p.bits, 0) AS BIGINT) AS surprisal_bits,
       CAST(CASE WHEN coalesce(p.n_tokens, 0) > 0
            THEN (p.bits * 1000000) // p.n_tokens ELSE 0 END AS BIGINT)
         AS bits_per_token_ppm
FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
""",
)
def unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring (operators.textstats.unigram_surprisal —
    the CCNet perplexity-filter shape, integer-exact): per-token surprisal
    is whole bits, ``length(bin(total div freq)) - 1`` on BIGINTs, so the
    oracle compares bit-for-bit with no transcendental-libm or
    double-ordering hazards.  Low bits/token = boilerplate-common text;
    high = rare-token noise — the two tails a corpus quality gate trims."""
    docs = load_table(spark, sf_dir, "documents")
    return T.unigram_surprisal(docs).orderBy("doc_id")

@query(
    "ccnet_perplexity_buckets",
    r"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '[ 	

]+'), x -> x <> '')) AS token
  FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
freq AS (SELECT token, sum(tf) AS freq FROM tf GROUP BY token),
tot AS (SELECT sum(freq) AS total FROM freq),
per AS (
  SELECT tf.doc_id,
         sum(tf.tf) AS n_tokens,
         sum(tf.tf * (length(bin(CAST(t.total // f.freq AS BIGINT))) - 1))
           AS bits
  FROM tf JOIN freq f USING (token) CROSS JOIN tot t
  GROUP BY tf.doc_id),
s AS (
  SELECT d.doc_id,
         CAST(CASE WHEN coalesce(p.n_tokens, 0) > 0
              THEN (p.bits * 1000000) // p.n_tokens ELSE 0 END AS BIGINT)
           AS ppm
  FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id),
h AS (SELECT ppm // 1000 AS m, count(*) AS c FROM s GROUP BY 1),
cum AS (SELECT m, sum(c) OVER (ORDER BY m) AS cs FROM h),
nn AS (SELECT count(*) AS n FROM s),
t AS (
  SELECT min(CASE WHEN cs >= (n + 2) // 3 THEN m END) AS t1,
         min(CASE WHEN cs >= (2 * n + 2) // 3 THEN m END) AS t2
  FROM cum, nn)
SELECT s.doc_id, s.ppm AS bits_per_token_ppm,
       CASE WHEN s.ppm // 1000 <= t.t1 THEN 'head'
            WHEN s.ppm // 1000 <= t.t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM s, t ORDER BY s.doc_id
""",
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail corpus partition (Wenzek et al. 2020 --
    the stage that CONSUMES the perplexity filter: rank by LM score, cut
    into equal thirds, train on the head first) over the integer-exact
    unigram surprisal (operators.textstats.surprisal_tercile_buckets).
    Tercile cut points come from the exact integer histogram of whole
    millibits/token (bounded value domain -> no global sort or window,
    driver fold over the domain not the corpus); assignment is by VALUE,
    so boundary ties share a bucket and the oracle restates the identical
    cumulative rule bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    return T.surprisal_tercile_buckets(docs).orderBy("doc_id")

@query(
    "gopher_quality_flags",
    r"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '[ 	
]+'), x -> x <> '') AS toks,
         list_filter(string_split_regex(lower(text), '[ 	
]+'), x -> x <> '') AS ltoks
  FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
              AS BIGINT) AS chars,
         CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
              AS BIGINT) AS alpha,
         CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
           + CAST((length(text) - length(replace(text, '...', ''))) // 3
                  AS BIGINT) AS syms,
         CAST(list_contains(ltoks, 'the')::int + list_contains(ltoks, 'be')::int
            + list_contains(ltoks, 'to')::int + list_contains(ltoks, 'of')::int
            + list_contains(ltoks, 'and')::int + list_contains(ltoks, 'that')::int
            + list_contains(ltoks, 'have')::int + list_contains(ltoks, 'with')::int
            AS INTEGER) AS n_stops
  FROM t),
r AS (
  SELECT doc_id, n_words,
    CAST(CASE WHEN n_words > 0 THEN (chars * 1000000) // n_words
         ELSE 0 END AS BIGINT) AS mean_word_len_ppm,
    CAST(CASE WHEN n_words > 0 THEN (alpha * 1000000) // n_words
         ELSE 0 END AS BIGINT) AS alpha_word_ppm,
    CAST(CASE WHEN n_words > 0 THEN (syms * 1000000) // n_words
         ELSE 0 END AS BIGINT) AS symbol_word_ppm,
    n_stops AS n_gopher_stops
  FROM m)
SELECT doc_id, n_words, mean_word_len_ppm, alpha_word_ppm,
       symbol_word_ppm, n_gopher_stops,
       (n_words BETWEEN 50 AND 100000)
       AND (mean_word_len_ppm BETWEEN 3000000 AND 10000000)
       AND (alpha_word_ppm >= 800000)
       AND (symbol_word_ppm <= 100000)
       AND (n_gopher_stops >= 2) AS keep
FROM r ORDER BY doc_id
""",
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher document-level quality ruleset (Rae et al. 2021 §A1.1
    — the named pre-filter MassiveText and most dataset papers apply
    before model-based scoring), integer-exact
    (operators.textstats.gopher_quality_flags): word-count bounds, mean
    word length, alphabetic-word fraction, symbol-to-word ratio, and
    the >= 2 stop-words prose check, each surfaced as an exact ppm/count
    column with the conjunction as ``keep``.  Pure per-row expressions
    over one scan — no shuffle, no Python — and the oracle restates the
    identical integer arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    return T.gopher_quality_flags(docs).orderBy("doc_id")

@query(
    "strip_dup_ngrams",
    r"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'), x -> x <> '') AS t
  FROM documents),
w AS (
  SELECT doc_id, t,
         list_transform(range(1, greatest(len(t) - 7, 0) + 1),
                        i -> struct_pack(pos := i, gram := array_to_string(t[i:i+7], ' '))) AS wins
  FROM toks),
occ AS (
  SELECT doc_id, u['pos'] AS pos, u['gram'] AS gram
  FROM (SELECT doc_id, unnest(wins) AS u FROM w)),
dup AS (
  SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM occ)
  GROUP BY gram HAVING count(*) >= 2),
starts AS (
  SELECT o.doc_id, list_sort(list(o.pos)) AS starts
  FROM occ o JOIN dup d ON o.gram = d.gram GROUP BY o.doc_id),
kept AS (
  SELECT w.doc_id AS doc_id, t,
         list_filter(range(1, len(t) + 1),
           j -> len(list_filter(coalesce(s.starts, []),
                                st -> j >= st AND j <= st + 7)) = 0) AS keep
  FROM w LEFT JOIN starts s ON w.doc_id = s.doc_id)
SELECT doc_id,
       -- array_to_string([]) is NULL in DuckDB; Spark concat_ws gives ''
       coalesce(array_to_string(list_transform(keep, j -> t[j]), ' '), '')
         AS clean_text,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(t) - len(keep) AS BIGINT) AS n_removed_tokens
FROM kept ORDER BY doc_id
""",
)
def strip_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span REMOVAL half of exact-substring dedup (operators.dedup.
    strip_dup_ngrams): every token covered by a corpus-duplicated word
    8-gram window is cut, survivors re-joined with single spaces.  The
    corpus-wide work is the same two hash shuffles as ``ngram_dup_stats``;
    the span arithmetic is per-doc native array lambdas (positions ->
    coverage -> filter), Python-free.  The oracle restates the identical
    window/coverage algebra over DuckDB list lambdas — clean_text strings
    compare bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    return D.strip_dup_ngrams(docs, n=8).orderBy("doc_id")
