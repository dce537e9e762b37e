"""Physical-plan contracts: pushdown, pruning, broadcast, top-k shape, and
no Python in the relational hot path (SURVEY.md §4)."""

from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (
    queries as Q,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.plans import (
    explain as E,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.tables import (
    load_table,
)


def test_filter_pushdown_to_parquet(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") == 42
    ).select("l_orderkey", "l_quantity")
    assert E.has_pushed_filter(df, "l_orderkey")


def test_column_pruning(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    schemas = E.read_schema_columns(df)
    assert schemas and set(schemas[0]) == {"l_orderkey", "l_quantity"}


def test_knn_projection_prunes_label(spark, sf_dir):
    """The kNN query needs only embedding + ids: reading all columns for a
    2-column projection would be wrong (brief: ReadSchema check)."""
    df = Q.QUERIES["knn_l2_top5"](spark, sf_dir)
    for cols in E.read_schema_columns(df):
        assert "label" in cols or set(cols) <= {"vec_id", "embedding", "label"}


def test_tpch_q3_broadcasts_dimension(spark, sf_dir):
    df = Q.QUERIES["tpch_q3_shipping_priority"](spark, sf_dir)
    assert E.has_broadcast_join(df)


def test_topk_is_take_ordered(spark, sf_dir):
    df = Q.QUERIES["knn_l2_top5"](spark, sf_dir)
    assert E.has_take_ordered(df)


def test_relational_queries_have_no_python(spark, sf_dir):
    for name in [
        "tpch_q1_pricing_summary",
        "tpch_q5_local_supplier_volume",
        "knn_l2_top5",
        "dedup_exact",
        "jaccard_similar_pairs",
        "minhash_lsh_pairs",
        "window_running_total",
        "events_tumbling_agg",
    ]:
        df = Q.QUERIES[name](spark, sf_dir)
        assert E.python_eval_nodes(df) == [], name


def test_exchange_counts_bounded(spark, sf_dir):
    """Shape regression guard: the canonical queries must not grow extra
    shuffles (AQE may reuse, but the static plan shouldn't inflate)."""
    # r12: q1 spreads the single-row-group fixture scan before its
    # decimal-heavy aggregate (queries/relational.py tpch_q1 docstring) —
    # one deliberate round-robin exchange on top of the agg + sort pair.
    assert E.num_exchanges(Q.QUERIES["tpch_q1_pricing_summary"](spark, sf_dir)) <= 3
    assert E.num_exchanges(Q.QUERIES["window_running_total"](spark, sf_dir)) <= 2
    # sessionize shares one partitioning across both window functions
    assert E.num_exchanges(Q.QUERIES["sessionize_events"](spark, sf_dir)) <= 2


def test_tpch_q13_aggregates_below_outer_join(spark, sf_dir):
    """Q13's rewrite contract: orders are pre-aggregated per customer, so
    the outer join's right side is an Aggregate, not the raw orders scan —
    the shuffle carries one row per customer, not one per order."""
    df = Q.QUERIES["tpch_q13_custdist"](spark, sf_dir)
    plan = E.optimized_plan_string(df)
    # Optimized logical plan: Join LeftOuter sits ABOVE an Aggregate keyed
    # by o_custkey.
    join_at = plan.find("Join LeftOuter")
    agg_at = plan.find("Aggregate [o_custkey", join_at)
    assert join_at != -1 and agg_at != -1, plan[:2000]


def test_tpch_q17_pushes_brand_filter_to_scan(spark, sf_dir):
    df = Q.QUERIES["tpch_q17_small_quantity_revenue"](spark, sf_dir)
    assert E.has_pushed_filter(df, "p_brand")
    assert E.has_broadcast_join(df)


def test_tpch_q4_semi_join_no_python(spark, sf_dir):
    df = Q.QUERIES["tpch_q4_order_priority"](spark, sf_dir)
    assert E.python_eval_nodes(df) == []
    assert E.has_pushed_filter(df, "o_orderdate")


def test_fingerprints_and_quality_are_pure_scans(spark, sf_dir):
    """Single-stage map queries must not shuffle to COMPUTE per-row values
    (the only exchanges allowed are spread()'s round-robin for the
    single-file fixture and the output sort's range exchange) nor call
    into Python."""
    for name in ["doc_quality_scores", "bpe_token_stats"]:
        df = Q.QUERIES[name](spark, sf_dir)
        assert E.python_eval_nodes(df) == [], name
        assert E.num_exchanges(df) <= 2, name


def test_fingerprints_use_arrow_not_rowwise_python(spark, sf_dir):
    """doc_rolling_fingerprints is the measured pandas-UDF exception (the
    native per-char HOF fold interpreted ~100x slower): it must call into
    Python via Arrow batches (ArrowEvalPython), never row-at-a-time
    (BatchEvalPython), and stay scan-shaped — exchanges only for spread()'s
    round-robin and the output sort."""
    df = Q.QUERIES["doc_rolling_fingerprints"](spark, sf_dir)
    assert E.python_eval_nodes(df) == ["ArrowEvalPython"]
    assert E.num_exchanges(df) <= 2


def test_weighted_sample_is_take_ordered_no_python(spark, sf_dir):
    """A-ES weighted sampling must stay a single TakeOrderedAndProject
    pass — no global sort, no shuffle, no Python (the whole point of the
    key-hash formulation at 100 TB)."""
    df = Q.QUERIES["weighted_sample_topk"](spark, sf_dir)
    assert E.has_take_ordered(df)
    assert E.python_eval_nodes(df) == []
    assert E.num_exchanges(df) == 0


def test_approx_aggregates_error_bounds(spark, sf_dir):
    """Approximate aggregates must degrade predictably: HLL distinct
    within the default 5% rsd (3 sigma ~ 15%), sketch estimate likewise,
    approx_percentile(10k) exact at fixture cardinalities."""
    rows = Q.QUERIES["approx_aggregates_gallery"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        exact = r["exact_distinct"]
        assert abs(r["hll_distinct"] - exact) <= max(0.15 * exact, 2), r
        assert abs(r["sketch_distinct"] - exact) <= max(0.15 * exact, 2), r
        # approx_percentile returns an observed value; the exact twin
        # interpolates between the two middle values — allow the gap.
        assert abs(r["approx_p50"] - r["exact_p50"]) <= 0.02 * max(
            abs(r["exact_p50"]), 1.0
        ), r


def test_training_ops_are_pruned_scans(spark, sf_dir):
    """The round-2 training ops read only (doc_id, text[, lang]) from the
    documents scan — never the full row — and keep Python out entirely."""
    for name, allowed in [
        ("pii_redaction", {"doc_id", "text"}),
        ("repetition_signals", {"doc_id", "text"}),
        ("sequence_packing", {"doc_id", "text"}),
        ("domain_mixture_sample", {"doc_id", "text", "lang"}),
    ]:
        df = Q.QUERIES[name](spark, sf_dir)
        for cols in E.read_schema_columns(df):
            assert set(cols) <= allowed, (name, cols)
        assert E.python_eval_nodes(df) == [], name


def test_pii_redaction_is_shuffle_free_scan(spark, sf_dir):
    """Redaction is a pure map: the only exchanges allowed are spread()'s
    round-robin and the output sort's range partitioning."""
    df = Q.QUERIES["pii_redaction"](spark, sf_dir)
    assert E.num_exchanges(df) <= 2


def test_mixture_sample_broadcasts_totals(spark, sf_dir):
    """The per-domain totals/weights are |domains| rows: they must come
    back onto the corpus scan as broadcast joins, never shuffle joins of
    the full table."""
    df = Q.QUERIES["domain_mixture_sample"](spark, sf_dir)
    assert E.has_broadcast_join(df)
    plan = E.plan_string(df, "executed")
    assert "SortMergeJoin" not in plan
