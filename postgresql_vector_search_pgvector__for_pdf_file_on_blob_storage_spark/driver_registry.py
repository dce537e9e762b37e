"""Driver-facing query registry: every operator, at most 50 entries.

Round 1's driver correctness sweep recorded exactly the first 50 of 86 (now 102)
registered queries — a hard cap in the harness, not a correctness issue.
This module folds the full registry (``queries.QUERIES`` — unchanged, still
used by tests and bench) into <=50 driver entries WITHOUT losing
verification strength:

- High-value operators keep their own entry (kNN, dedup family, pipelines,
  streaming twins, TPC-H Q1/Q3, ...).
- The long tail is grouped into **suite** entries.  A suite runs each
  member query unchanged, canonicalizes every row to a single string with
  engine-neutral formatting, and unions the members as ``(q, row)`` rows.
  The DuckDB oracle does the identical wrapping around each member's
  original oracle SQL.  The driver's row-count + schema + value-hash
  compare therefore still verifies EVERY member row bit-for-bit — one red
  suite row means some member diverged (scripts/check_correctness.py
  pinpoints which).

Canonical-string rules (why the bytes match across engines):

- strings pass through (NULL -> a sentinel both engines agree on);
- integers/booleans render via CAST(x AS VARCHAR) (same text both sides);
- doubles render via ``%.6f`` (Spark ``format_string`` = Java, DuckDB
  ``printf`` = C).  Java rounds HALF_UP, C half-even; a double CAN sit
  exactly on a 10^-6 half boundary, but only when it is a dyadic rational
  whose decimal expansion terminates in the 7th place with a 5 — i.e. a
  small-power-of-two denominator (x/2^k, k<=7 after reduction; e.g.
  516/512 = 1.0078125 formatted 1.007813 by Java, 1.007812 by C).  Member
  queries must therefore never divide by a power of two on a formatted
  double column (sequence_packing uses a 500-token capacity for exactly
  this reason — /500 terminates at 3 decimals, nowhere near a boundary);
  with that rule the two conventions never diverge.  The member
  queries already emit deterministic doubles (decimal-exact sums, single
  IEEE ops — see queries/_core.py module doc), so identical inputs reach the
  formatter on both sides.
- The suite output is totally ordered by ``(q, row)`` — a deterministic
  ordering both engines produce identically (binary string collation).
"""

from __future__ import annotations

from functools import reduce
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import queries as Q

# NULL sentinel: must never appear as real data in any member output.
_NULL = "∅"  # ∅

# ---------------------------------------------------------------------------
# Suite membership — every oracle-backed query in queries.QUERIES must be
# either in INDIVIDUAL or in exactly one SUITES entry (asserted below).
#
# !!! DRIVER ENTRY CEILING: the driver records AT MOST 50 top-level entries
# (INDIVIDUAL + SUITES + ROWS_ONLY + ROWS_ONLY_SUITES) and SILENTLY
# TRUNCATES the rest.  The registry sits AT the cap.  Any NEW
# oracle-backed query must join an EXISTING suite (then rerun
# scripts/gen_driver_schemas.py); a new rows-only query must join a
# ROWS_ONLY_SUITES gallery.  ``build()`` asserts the cap so a 51st entry
# fails tests here, not silently in the driver sweep.
# ---------------------------------------------------------------------------

# The driver harness records at most this many entries per sweep.
DRIVER_ENTRY_CAP = 50

SUITES: dict[str, list[str]] = {
    # pgvector distance family + the kNN joins (folded r04 for headroom)
    "knn_distance_family": [
        "knn_l2_top5",
        "knn_cosine_top5",
        "knn_dot_top5",
        "knn_join_l2",
        # r6: SQ8 encode/decode roundtrip — the quantization tier's first
        # oracle-backed row (VERDICT r5 next-round #3).
        "sq8_roundtrip",
        # r7: PQ argmin-encode + ADC scan with fixed formula codebooks
        # (VERDICT r6 next-round #2) — closes the last rows-only
        # quantization surface.
        "pq_adc_fixed_codebook",
        # r8: IVF assignment + nprobe pruning + in-cluster scan with
        # fixed formula centroids (VERDICT r7 next-round #2) — the last
        # mechanism-bearing rows-only ANN surface gets an oracle twin.
        "ivf_fixed_centroids",
        # r8: the full SemDeDup mechanism (assignment, blocked-GEMM
        # cosine edges, components, min-id keeper) with fixed formula
        # centroids — membership-only output, recursive-CTE oracle.
        "semantic_dedup_fixed_centroids",
        # r8: bucketed random-projection LSH join with fixed formula
        # hyperplanes — buckets, candidate join, and exact verify all
        # bit-checked incl. which pairs the bucketing misses.
        "embedding_lsh_fixed_planes",
        # r11: the COMPOSED IVFADC+R path (coarse assign -> residual PQ
        # encode -> nprobe pruning -> residual-LUT ADC -> exact refine)
        # with fixed formula centroids AND codebooks
        # (IVFPQIndex.from_params) — ivfpq_search semantics no longer
        # rest on rows-only + recall floors (VERDICT r10 #2).
        "ivfpq_fixed_books",
    ],
    # reference listing / scalar-transform shapes over documents
    "doc_listing_suite": [
        "listing_registered",
        "listing_failed",
        "filter_suffix",
        "normalize_whitespace",
        "url_build",
    ],
    "set_ops_suite": [
        "set_ops_except",
        "set_ops_except_all",
        "set_ops_intersect",
    ],
    "grouping_suite": [
        "agg_rollup_lineitem",
        "agg_cube_orders",
        "agg_grouping_sets",
        "pivot_returnflag_by_status",
        "having_big_part_groups",
        "distinct_counts_per_group",
        "stats_exact_moments",
        "order_price_percentiles",
    ],
    "window_suite": [
        "window_top_orders_per_customer",
        "window_running_total",
        "window_rank_gallery",
        "lag_lead_gallery",
    ],
    "function_gallery_suite": [
        "scalar_function_gallery",
        "string_functions_gallery",
        "date_functions_gallery",
        "array_functions_gallery",
        "json_extract_events",
        "json_struct_rollup",
        "unpivot_order_metrics",
        "variant_extract_events",
        "edit_distance_gallery",
        # r9: multimodal decode STATS with formula PPM fixtures — the
        # real stdlib P6 parse + mapInPandas stats path gets an oracle
        # twin derived from doc_id alone (VERDICT r8 next-round #6).
        "multimodal_fixed_stats",
        # r9: the same move for AUDIO — real RIFF/WAVE PCM fixtures
        # (stdlib chunk-walking parse), rate/length byte-exact and the
        # rms bit-deterministic via exact int16-square sums.
        "multimodal_audio_fixed_stats",
        # r10: the TRANSFORM paths get the same move (VERDICT r9 #4) —
        # the real mapInPandas nearest-neighbor resize and the
        # every-2nd-frame video explode, each reduced to a
        # position-weighted pixel/byte checksum derivable from doc_id.
        "multimodal_resize_fixed",
        "multimodal_framesample_fixed",
    ],
    "join_family_suite": [
        "join_semi_active_customers",
        "join_anti_inactive_customers",
        "join_left_outer_order_counts",
    ],
    "events_window_suite": [
        "events_tumbling_agg",
        "events_sliding_window",
        "sessionize_events",
        "window_trailing_10min",
    ],
    "text_stats_suite": [
        "token_stats",
        "bpe_token_stats",
        "doc_quality_scores",
        "doc_rolling_fingerprints",
        "pii_redaction",
        "repetition_signals",
        "sequence_packing",
        "ngram_dup_stats",
        "strip_dup_ngrams",
        "simhash_fingerprints",
        # r6: minhash mechanism parity — md5 hash family restated in SQL
        # (the simhash convention), closing B5's last oracle gap.
        "minhash_sigs_md5",
        # r8: the BANDING mechanism's oracle row — signature, band split,
        # bucket join, candidate dedup, exact-Jaccard verify, all
        # bit-checked incl. which pairs the banding misses.
        "minhash_lsh_pairs_md5",
        # r9: the Gopher document-level quality ruleset — exact ppm
        # metrics + the keep conjunction, identical integer arithmetic
        # restated in the oracle.
        "gopher_quality_flags",
        # r9: the BPE ENCODE mechanism with fixed formula merge ranks —
        # the real broadcast-ranks greedy encoder vs a recursive-CTE
        # twin over distinct pieces (VERDICT r8 next-round #2).
        "bpe_encode_fixed_ranks",
    ],
    "corpus_stats_suite": [
        "lang_distribution",
        "deterministic_sample_per_lang",
        "token_frequencies_salted",
        "weighted_sample_topk",
        "domain_mixture_sample",
        "dataset_split_shuffle",
        "unigram_surprisal",
        "token_frequencies_top100",
        "corpus_curation_pipeline",
        # r8: the data-SELECTION stage — Moore-Lewis/DSIR hashed n-gram
        # importance top-k and the quality classifier's serving path with
        # fixed formula weights (both integer-exact; operators/selection.py).
        "dsir_select",
        "quality_classifier_fixed_weights",
        # r9: CCNet's head/middle/tail partition over the integer-exact
        # surprisal — tercile cut points from the bounded millibit
        # histogram, assignment by value (ties share a bucket).
        "ccnet_perplexity_buckets",
        # r9: cluster-aware train/val/test split — near-dup components
        # never straddle the boundary (the contamination guard a doc-level
        # split lacks); same pair graph + closure as dedup_clusters, same
        # key-hash as dataset_split_shuffle, applied to the component
        # representative (operators/dedup.leakage_safe_split).
        "leakage_safe_split",
        # r10: the COMPOSED curation run — gopher gate -> ccnet terciles
        # (drop tail) -> exact dedup -> one shared near-dup pair graph ->
        # leakage-safe split + near-dup drop -> DSIR top-k; the stage
        # BOUNDARIES are oracle-checked, not just each operator
        # (operators/dedup.curate_corpus_v2, VERDICT r9 next-round #1).
        "curation_v2_pipeline",
        # r11: the v3 composition — the Lee et al. span-strip stage live
        # between exact dedup and the pair graph (cleaned text feeds the
        # shingles/split/DSIR), and the Gopher stop-word rule live at
        # min_stops=2 over a deterministic stop-word overlay (VERDICT
        # r10 next-round #1 + #8).  Sibling of v2, not a replacement.
        "curation_v3_pipeline",
    ],
    "tpch_suite_a": ["tpch_q2_min_cost_supplier", "tpch_q4_order_priority",
                     "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
                     "tpch_q7_nation_volume"],
    "tpch_suite_b": ["tpch_q8_market_share", "tpch_q9_product_type_profit",
                     "tpch_q10_returned_items", "tpch_q11_important_stock",
                     "tpch_q12_shipmode_priority"],
    "tpch_suite_c": ["tpch_q13_custdist", "tpch_q14_promo_effect",
                     "tpch_q15_top_supplier", "tpch_q16_supplier_count",
                     "tpch_q17_small_quantity_revenue"],
    "tpch_suite_d": ["tpch_q18_large_volume_customers",
                     "tpch_q19_discounted_revenue",
                     "tpch_q20_dominant_supplier", "tpch_q21_waiting_supplier",
                     "tpch_q22_global_sales_opportunity"],
    # Retrieval-side closure (operators/ranking.py): lexical BM25 ranking,
    # hybrid BM25+vector RRF fusion, benchmark decontamination.
    "retrieval_suite": [
        "bm25_keyword_search",
        "hybrid_rrf_search",
        "decontamination_overlap",
    ],
}

# Oracle-backed queries that keep their own driver entry.  r04 folded 9
# former individuals into topic suites (VERDICT r03 next-round #3) to buy
# headroom under DRIVER_ENTRY_CAP for future operators.
INDIVIDUAL: list[str] = [
    "dedup_exact",
    "jaccard_similar_pairs",
    "dedup_clusters",
    "embedding_near_dup",
    "status_listings",
    "status_state_machine",
    "correlated_scalar_subquery",
    "asof_join_last_click_before_purchase",
    "vector_centroid_per_label",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "sse_projection_sql",
]

# Rows-only SUITES: members share one driver entry via the same
# (q, row) canonical union as the oracle-backed suites, but with no
# DuckDB twin — the driver records the combined row count.  Members keep
# their individual pytest/cross-check coverage (e.g. udtf_chunk_lateral's
# count is asserted equal to chunk_explode's in tests).
ROWS_ONLY_SUITES: dict[str, list[str]] = {
    # chunking + the end-to-end text->BPE-tokens->packed-windows layout
    "chunking_gallery": [
        "chunk_explode",
        "udtf_chunk_lateral",
        "tokenize_pack_pipeline",
    ],
    # Both incremental-ingest dedup paths (MinHash band store / semantic
    # vector store) in one entry; stream==batch equivalence for each is
    # pinned in pytest (test_streaming.py / test_semdedup.py) AND, since
    # r08, driver-visible: every member carries a constant
    # ``batch_diff_rows`` column (symmetric bag difference vs its batch
    # twin, 0 iff equivalent — VERDICT r7 next-round #5).
    "streaming_dedup_gallery": [
        "streaming_neardup_matches",
        "streaming_semdedup_matches",
        "streaming_substring_stats",
        "streaming_substring_keyed",
        # r06: the LSM-tiered form — history snapshot probed JVM-side,
        # keyed state bounded by session-novel grams.
        "streaming_substring_tiered",
        # r07: the bounded-memory form — on-disk sorted runs, a
        # memory-capped Bloom screen, row-group point-lookup verify.
        "streaming_substring_bloom",
        # r11: incremental CURATION maintenance — gate + fingerprint log
        # + banded near-dup stores composed per arrival batch through
        # the real stream; survivor view converges to
        # curate_corpus(use_minhash=True, max_df=None) (witness
        # batch_diff_rows — VERDICT r10 next-round #7).
        "streaming_curation_maintenance",
        # r12: V2 maintenance — the corpus-stat stages too (tercile LM
        # from per-epoch token-frequency partials, DSIR from per-doc
        # bucket stores, leakage-safe split) composed per arrival batch;
        # survivor+selection view converges to curate_corpus_v2(
        # min_stops=0, use_minhash=True, max_df=None) on all 13 columns
        # (witness batch_diff_rows — VERDICT r11 next-round #1).
        "streaming_curation_v2_maintenance",
    ],
    # r9: the Gumbel resampling mode with its numpy witness columns —
    # numpy_flag_diff_rows == 0 iff the seeded sample reproduces
    # outside Spark (VERDICT r8 next-round #5).
    "selection_gallery": [
        "dsir_select_gumbel",
    ],
    # r10: the three external-service seams run for REAL over loopback
    # sockets (VERDICT r9 "What's missing" #1-3): HTTP embedding
    # transport with genuine 429/503-driven retries, the SSE gateway
    # with a text/event-stream client reading back the push stream, and
    # Event-Grid-shaped blob-notification ingest with per-event failure
    # isolation.  Each member carries a witness diff column (0 iff the
    # network path equals its in-process batch twin).
    "external_seams_gallery": [
        "embed_http_roundtrip",
        "sse_http_roundtrip",
        "blob_event_ingest",
    ],
}

# Rows-only queries (no SQL oracle) that keep their own driver entry.
ROWS_ONLY: list[str] = [
    "flagship_rag_search",
    "semantic_dedup",
    # r6: the measured boundary-miss mitigation now runs in the driver
    # sweep (VERDICT r4 #8 / r5 next-round #8).
    "semantic_dedup_topm",
    "multimodal_image_pipeline",
    "summarize_hits",
    "sse_event_projection",
    "ivf_ann_search",
    "minhash_lsh_pairs",
    "embedding_near_dup_lsh",
    "embed_retry_pipeline",
    "approx_aggregates_gallery",
    "ann_recall_report",
    "bpe_vocab_train",
    # r8: distributed logistic-regression training over hashed features —
    # float GD has no bit-stable SQL twin; serving path oracle-verified via
    # quality_classifier_fixed_weights, gradient numpy-pinned in tests.
    "quality_classifier_train",
]


# ---------------------------------------------------------------------------
# Canonical-row builders
# ---------------------------------------------------------------------------

_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _canon_spark_col(name: str, dtype: str):
    col = F.col(name)
    if dtype == "string":
        return F.coalesce(col, F.lit(_NULL))
    if dtype in ("double", "float"):
        # Integer micro-units via floor(v*1e6 + 0.5) — pure IEEE-754 ops,
        # bit-identical across engines.  The former %.6f diverged: Java's
        # Formatter pads the SHORTEST-repr digits with zeros past ~17
        # significant digits while C printf prints the exact expansion, so
        # any |v| >= ~1e11 formatted differently (sf0.1 sweep,
        # grouping_suite).  Formatting libraries are out; arithmetic is in.
        # Guard the extremes BEFORE the cast: for |v| >= ~9.2e12 the
        # micro-units overflow int64 (Spark's non-ANSI cast saturates,
        # DuckDB's CAST raises) and NaN/Inf diverge the same way, so both
        # engines clamp those bands to identical sentinel strings — a real
        # value mismatch inside a band still can't produce a false PASS
        # unless both engines land in the same band, where micro-unit
        # precision exceeded double precision anyway.
        d = col.cast("double")
        micros = F.floor(d * F.lit(1_000_000.0) + F.lit(0.5))
        return (
            F.when(col.isNull(), F.lit(_NULL))
            .when(F.isnan(d), F.lit("nan"))
            .when(d >= F.lit(9.0e12), F.lit("pos_big"))
            .when(d <= F.lit(-9.0e12), F.lit("neg_big"))
            .otherwise(micros.cast("bigint").cast("string"))
        )
    if dtype in _INT_TYPES:
        return F.when(col.isNull(), F.lit(_NULL)).otherwise(col.cast("string"))
    if dtype == "boolean":
        return F.when(col.isNull(), F.lit(_NULL)).otherwise(
            col.cast("int").cast("string")
        )
    raise TypeError(f"unsupported suite-member column type {dtype!r} ({name})")


def canon_spark(name: str, df: DataFrame) -> DataFrame:
    """One ``(q, row)`` row per member row, formatted engine-neutrally."""
    parts = [_canon_spark_col(c, t) for c, t in df.dtypes]
    return df.select(
        F.lit(name).alias("q"), F.concat_ws("|", *parts).alias("row")
    )


def _canon_sql_col(name: str, dtype: str) -> str:
    col = f'"{name}"'
    if dtype == "string":
        return f"coalesce({col}, '{_NULL}')"
    if dtype in ("double", "float"):
        # Mirror of _canon_spark_col's micro-unit form, including the
        # NaN/Inf/overflow clamp bands (see comment there).
        return (
            f"CASE WHEN {col} IS NULL THEN '{_NULL}' "
            f"WHEN isnan(CAST({col} AS DOUBLE)) THEN 'nan' "
            f"WHEN CAST({col} AS DOUBLE) >= 9e12 THEN 'pos_big' "
            f"WHEN CAST({col} AS DOUBLE) <= -9e12 THEN 'neg_big' "
            f"ELSE CAST(CAST(floor(CAST({col} AS DOUBLE) * 1000000.0 + 0.5)"
            f" AS BIGINT) AS VARCHAR) END"
        )
    if dtype in _INT_TYPES:
        return (
            f"CASE WHEN {col} IS NULL THEN '{_NULL}' "
            f"ELSE CAST({col} AS VARCHAR) END"
        )
    if dtype == "boolean":
        return (
            f"CASE WHEN {col} IS NULL THEN '{_NULL}' "
            f"ELSE CAST(CAST({col} AS INTEGER) AS VARCHAR) END"
        )
    raise TypeError(f"unsupported suite-member column type {dtype!r} ({name})")


def canon_sql(name: str, member_sql: str, schema: list[tuple[str, str]]) -> str:
    parts = ", ".join(_canon_sql_col(c, t) for c, t in schema)
    return (
        f"SELECT '{name}' AS q, concat_ws('|', {parts}) AS row\n"
        f"FROM (\n{member_sql.strip()}\n) __m_{name}"
    )


def _suite_fn(members: list[str]) -> Callable[[SparkSession, str], DataFrame]:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        dfs = [
            canon_spark(m, Q.QUERIES[m](spark, sf_dir)) for m in members
        ]
        return reduce(DataFrame.unionByName, dfs).orderBy("q", "row")

    return fn


def _suite_sql(members: list[str]) -> str:
    from .driver_schemas import MEMBER_SCHEMAS

    parts = [canon_sql(m, Q.ORACLES[m], MEMBER_SCHEMAS[m]) for m in members]
    return "\nUNION ALL\n".join(parts) + "\nORDER BY q, row"


def build() -> tuple[dict[str, Callable], dict[str, str]]:
    """Return ``(queries, oracles)`` for the driver contract."""
    # Coverage invariant: every registered query is either driver-visible
    # on its own or a member of exactly one suite.
    suite_members = [m for ms in SUITES.values() for m in ms]
    ro_suite_members = [m for ms in ROWS_ONLY_SUITES.values() for m in ms]
    assert len(suite_members + ro_suite_members) == len(
        set(suite_members) | set(ro_suite_members)
    ), "duplicate member"
    covered = (
        set(INDIVIDUAL)
        | set(ROWS_ONLY)
        | set(suite_members)
        | set(ro_suite_members)
    )
    missing = set(Q.QUERIES) - covered
    assert not missing, f"queries missing from driver registry: {missing}"
    for m in suite_members:
        assert m in Q.ORACLES, f"suite member {m} has no oracle"

    queries: dict[str, Callable] = {}
    oracles: dict[str, str] = {}
    for name in INDIVIDUAL:
        queries[name] = Q.QUERIES[name]
        oracles[name] = Q.ORACLES[name]
    for suite, members in SUITES.items():
        queries[suite] = _suite_fn(members)
        oracles[suite] = _suite_sql(members)
    for suite, members in ROWS_ONLY_SUITES.items():
        queries[suite] = _suite_fn(members)
    for name in ROWS_ONLY:
        queries[name] = Q.QUERIES[name]
    # The driver records at most DRIVER_ENTRY_CAP entries and silently
    # truncates beyond that — fail HERE instead (see module-top warning).
    assert len(queries) <= DRIVER_ENTRY_CAP, (
        f"driver registry has {len(queries)} entries > cap"
        f" {DRIVER_ENTRY_CAP}; fold the new query into an existing suite"
        " (driver_registry.SUITES) or the driver sweep will silently"
        " truncate the registry"
    )
    return queries, oracles
