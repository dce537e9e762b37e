"""Relational closure, batch 2: joins (semi/anti/outer/asof), grouping sets, pivot, exact moments, sessionization, galleries, TPC-H Q4/Q6/Q7/Q12/Q14/Q18.

Mechanical split of the former single-file queries.py (round 9) — the
section bodies are verbatim; only relative-import depth changed.
"""

from __future__ import annotations

from ._core import *  # noqa: F401,F403
from .relational import _DEC, _dec_to_double, _dsum  # noqa: F401


# ---------------------------------------------------------------------------
# Relational closure, batch 2: joins (semi/anti/outer/asof), grouping sets,
# pivot, exact moments, sessionization, sliding windows, function galleries
# ---------------------------------------------------------------------------


@query(
    "join_semi_active_customers",
    """
SELECT c.c_custkey, c.c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 300000)
ORDER BY c.c_custkey
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) — SURVEY.md §2B B8."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )

@query(
    "join_anti_inactive_customers",
    """
SELECT c.c_custkey, c.c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
ORDER BY c.c_custkey
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — SURVEY.md §2B B8."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )

@query(
    "join_left_outer_order_counts",
    """
SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
FROM customer c LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
GROUP BY c.c_custkey ORDER BY c.c_custkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero matching orders
    (count(col) skips nulls in both engines)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )

@query(
    "asof_join_last_click_before_purchase",
    """
SELECT p.event_id, p.user_id, c.event_id AS click_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
ORDER BY p.event_id
""",
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY.md custom-operator tier): for each purchase, the
    latest click at-or-before it per user.

    Spark lacks a native ASOF; the scalable composition is the union-tag
    trick: one sort per user over the combined stream, carrying the last
    click forward with ``last(ignorenulls)`` — a single shuffle+sort, no
    range join, no per-row subquery.  Ties (click.ts == purchase.ts) sort
    click-first to honor <=.
    """
    ev = load_table(spark, sf_dir, "events")
    both = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias(
            "__click_id"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            "ts",
            # click before purchase at identical ts => <= semantics
            F.when(F.col("event_type") == "click", 0).otherwise(1),
            "event_id",
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = both.withColumn(
        "click_event_id", F.last("__click_id", ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "click_event_id")
        .orderBy("event_id")
    )

@query(
    "agg_cube_orders",
    """
SELECT o_orderstatus, o_orderpriority,
  CAST(count(*) AS BIGINT) AS n,
  (CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) - (sum(CAST(o_totalprice AS DECIMAL(18,6))) % 1) AS BIGINT) AS DOUBLE) + CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) % 1 AS DOUBLE)) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over orders (SURVEY.md §2B B7)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            _dsum(F.col("o_totalprice")).alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )

@query(
    "agg_grouping_sets",
    """
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (same text runs on DuckDB)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )

@query(
    "pivot_returnflag_by_status",
    """
SELECT l_returnflag,
  (CAST(CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,6)) END) - (sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,6)) END) % 1) AS BIGINT) AS DOUBLE) + CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,6)) END) % 1 AS DOUBLE)) AS qty_F,
  (CAST(CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,6)) END) - (sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,6)) END) % 1) AS BIGINT) AS DOUBLE) + CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,6)) END) % 1 AS DOUBLE)) AS qty_O
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation); the oracle is the CASE-WHEN expansion —
    identical semantics, engine-neutral."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(_dec_to_double(F.sum(F.col("l_quantity").cast(_DEC))))
        .withColumnRenamed("F", "qty_F")
        .withColumnRenamed("O", "qty_O")
        .orderBy("l_returnflag")
    )

@query(
    "stats_exact_moments",
    """
WITH s AS (
  SELECT l_returnflag,
    CAST(count(*) AS BIGINT) AS n,
    sum(CAST(l_quantity AS DECIMAL(18,6))) AS s1,
    sum(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS s2,
    sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS p1,
    sum(CAST(l_quantity * l_extendedprice AS DECIMAL(24,6))) AS sp
  FROM lineitem GROUP BY l_returnflag)
, m AS (
  SELECT l_returnflag, n, s1,
    CAST(n AS DECIMAL(19,0)) * CAST(s2 AS DECIMAL(19,6))
      - CAST(s1 AS DECIMAL(19,6)) * CAST(s1 AS DECIMAL(19,6)) AS vnum,
    CAST(n AS DECIMAL(19,0)) * CAST(sp AS DECIMAL(19,6))
      - CAST(s1 AS DECIMAL(19,6)) * CAST(p1 AS DECIMAL(19,6)) AS cnum
  FROM s)
SELECT l_returnflag, n,
  CAST(s1 AS DOUBLE) / n AS mean_qty,
  (CAST(CAST(vnum - (vnum % 1) AS BIGINT) AS DOUBLE)
   + CAST(CAST(CAST(vnum % 1 AS DECIMAL(7,6)) * 1000000 AS BIGINT) AS DOUBLE)
     / 1000000.0) / n / (n - 1) AS var_qty,
  (CAST(CAST(cnum - (cnum % 1) AS BIGINT) AS DOUBLE)
   + CAST(CAST(CAST(cnum % 1 AS DECIMAL(7,6)) * 1000000 AS BIGINT) AS DOUBLE)
     / 1000000.0) / n / (n - 1) AS covar_qty_price
FROM m ORDER BY l_returnflag
""",
)
def stats_exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance/covariance computed from exact decimal sums (not the
    engines' streaming variance, whose merge order differs).

    The moment NUMERATORS (n*s2 - s1^2, n*sp - s1*p1) are computed
    entirely in decimal — explicitly-sized operands so the products stay
    within 38 digits and both engines are exact — and only the small
    cancelled result is cast to double.  Casting the big sums to double
    FIRST (the pre-r04 form) diverged at sf1: a decimal whose integer
    units exceed 2^53 is double-rounded by DuckDB (int128 -> double, then
    /10^scale) but single-rounded by Spark (BigDecimal), and the
    covariance's catastrophic cancellation amplified that last-ulp
    difference ~4 orders of magnitude into a visible micro-unit flip."""
    l = load_table(spark, sf_dir, "lineitem")
    dec = lambda c, t: F.col(c).cast(t)  # noqa: E731
    s = l.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast(_DEC)).alias("s1"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast(_DEC)).alias(
            "s2"
        ),
        F.sum(F.col("l_extendedprice").cast(_DEC)).alias("p1"),
        F.sum(
            (F.col("l_quantity") * F.col("l_extendedprice")).cast(
                "decimal(24,6)"
            )
        ).alias("sp"),
    )
    n = F.col("n")
    # Width >= 19 on every operand forces DuckDB onto int128 arithmetic
    # (narrower widths multiply in int64 and overflow); products cap at
    # width 38 so both engines stay exact.
    nd = n.cast("decimal(19,0)")
    var_num = nd * dec("s2", "decimal(19,6)") - dec("s1", "decimal(19,6)") * dec(
        "s1", "decimal(19,6)"
    )
    cov_num = nd * dec("sp", "decimal(19,6)") - dec("s1", "decimal(19,6)") * dec(
        "p1", "decimal(19,6)"
    )

    def exact_to_double(num):
        # hi/lo split: truncated integer part and signed fractional micros
        # as BIGINTs, recombined in IEEE arithmetic.  A direct decimal ->
        # double cast of the numerator still diverged (its integer units
        # exceed 2^53); bigint -> double conversion is a SINGLE correctly
        # rounded step in every engine, so this path is bit-identical.
        hi = (num - (num % 1)).cast("bigint").cast("double")
        lo = ((num % 1).cast("decimal(7,6)") * 1000000).cast("bigint").cast(
            "double"
        )
        return hi + lo / F.lit(1000000.0)

    return s.select(
        "l_returnflag",
        "n",
        (F.col("s1").cast("double") / n).alias("mean_qty"),
        (exact_to_double(var_num) / n / (n - 1)).alias("var_qty"),
        (exact_to_double(cov_num) / n / (n - 1)).alias("covar_qty_price"),
    ).orderBy("l_returnflag")

@query(
    "distinct_counts_per_group",
    """
SELECT l_returnflag,
  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct aggregation (expand + two-phase agg)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
        .orderBy("l_returnflag")
    )

@query(
    "having_big_part_groups",
    """
SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_partkey HAVING count(*) >= 40
ORDER BY n DESC, l_partkey
""",
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + HAVING (post-aggregation filter)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 40)
        .orderBy(F.desc("n"), F.asc("l_partkey"))
    )

@query(
    "sessionize_events",
    """
WITH flagged AS (
  SELECT event_id, user_id, ts,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_id, user_id,
  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
FROM flagged ORDER BY user_id, ts, event_id
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min gap): lag + gap-flag + running sum —
    one shuffle, both windows share the same partitioning."""
    from ..streaming.windows import sessionize_batch

    ev = load_table(spark, sf_dir, "events")
    return (
        sessionize_batch(ev, gap_seconds=1800)
        .select("event_id", "user_id", "session_id")
        .orderBy("user_id", "ts", "event_id")
        .select("event_id", "user_id", "session_id")
    )

@query(
    "events_sliding_window",
    """
WITH b AS (
  SELECT CAST((epoch_us(ts) // 600000000) * 600 AS BIGINT) AS w0,
         CAST(((epoch_us(ts) - 300000000) // 600000000) * 600 + 300 AS BIGINT) AS w1,
         event_type, value
  FROM events),
u AS (
  SELECT w0 AS window_start, event_type, value FROM b
  UNION ALL
  SELECT w1 AS window_start, event_type, value FROM b)
SELECT window_start, event_type,
  CAST(count(*) AS BIGINT) AS n,
  (CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) - (sum(CAST(value AS DECIMAL(18,6))) % 1) AS BIGINT) AS DOUBLE) + CAST(sum(CAST(value AS DECIMAL(18,6))) % 1 AS DOUBLE)) AS total_value
FROM u GROUP BY window_start, event_type
ORDER BY window_start, event_type
""",
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10 min width, 5 min slide): each event lands in two
    windows.  Spark's native F.window handles the replication; the oracle
    expands the two phases explicitly.  Window start emitted as epoch
    seconds (timezone-proof)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            _dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )

@query(
    "lag_lead_gallery",
    """
SELECT event_id, user_id,
  lag(value) OVER w AS prev_value,
  lead(value) OVER w AS next_value,
  first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_value_seen,
  CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INTEGER) AS value_rank
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, ts, event_id
""",
)
def lag_lead_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions: lag/lead/first_value/rank (raw doubles —
    no aggregation, so values are bit-exact across engines)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("first_value_seen"),
        F.rank()
        .over(Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id")))
        .cast("int")
        .alias("value_rank"),
    ).orderBy("user_id", "ts", "event_id")

@query(
    "date_functions_gallery",
    """
SELECT o_orderkey,
  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
  CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mo,
  CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS qtr,
  CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS dom,
  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
  CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER) AS days_since_epoch_start
FROM orders ORDER BY o_orderkey
""",
)
def date_functions_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar functions (SURVEY.md §2B B12) emitted as ints and
    formatted strings so timezone conventions can't skew the compare."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        )
        .cast("int")
        .alias("days_since_epoch_start"),
    ).orderBy("o_orderkey")

@query(
    "string_functions_gallery",
    """
SELECT p_partkey,
  lpad(p_brand, 12, '_') AS brand_padded,
  trim(p_name) AS name_trimmed,
  split_part(p_type, ' ', 1) AS type_head,
  translate(p_brand, '#', 'N') AS brand_translated,
  CAST(strpos(p_name, 'a') AS INTEGER) AS first_a,
  reverse(p_brand) AS brand_rev,
  repeat(p_brand, 2) AS brand_twice
FROM part ORDER BY p_partkey
""",
)
def string_functions_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar library (SURVEY.md §2B B12): pad/trim/split/translate/
    locate/reverse/repeat — all codegen'd natively in both engines."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "_").alias("brand_padded"),
        F.trim(F.col("p_name")).alias("name_trimmed"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.translate("p_brand", "#", "N").alias("brand_translated"),
        F.locate("a", F.col("p_name")).cast("int").alias("first_a"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.repeat(F.col("p_brand"), 2).alias("brand_twice"),
    ).orderBy("p_partkey")

@query(
    "set_ops_intersect",
    """
SELECT o_custkey FROM orders WHERE strftime(o_orderdate, '%Y-%m') = '1995-01'
INTERSECT
SELECT o_custkey FROM orders WHERE strftime(o_orderdate, '%Y-%m') = '1995-02'
ORDER BY o_custkey
""",
)
def set_ops_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (SURVEY.md §2B B10)."""
    o = load_table(spark, sf_dir, "orders")
    ym = F.date_format("o_orderdate", "yyyy-MM")
    jan = o.filter(ym == "1995-01").select("o_custkey")
    feb = o.filter(ym == "1995-02").select("o_custkey")
    return jan.intersect(feb).orderBy("o_custkey")

@query(
    "vector_centroid_per_label",
    f"""
WITH e AS (
  SELECT label, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings)
SELECT label, CAST(pos AS INTEGER) AS pos,
  -- dyadic-grid quantization: floor(v * 2^30) is exact IEEE arithmetic
  -- (power-of-two scaling never rounds; floor is exact), so the bigint
  -- sum is order-independent AND tie-free.  A decimal cast is NOT: floats
  -- are dyadic, so exact decimal ties occur (e.g. 0.1494140625 at scale
  -- 9), and Spark rounds them HALF_UP while DuckDB rounds half-to-even —
  -- caught by the sf0.1 sweep.
  CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1073741824.0) AS BIGINT)) AS DOUBLE)
    / 1073741824.0 / count(*) AS centroid_val
FROM e GROUP BY label, pos ORDER BY label, pos
""",
)
def vector_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector aggregation: per-label centroid as (label, dim, value) rows —
    posexplode + groupBy is the shuffle-friendly shape for element-wise
    vector aggs (no giant array state per group).  Elements are quantized
    to the 2^-30 grid before summing (exact, order-free, and — unlike a
    decimal cast — free of cross-engine tie-rounding; see oracle SQL)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "v")
    ).select("label", (F.col("pos0") + 1).cast("int").alias("pos"), "v")
    return (
        ex.groupBy("label", "pos")
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("v").cast("double") * F.lit(1073741824.0)
                    ).cast("bigint")
                ).cast("double")
                / F.lit(1073741824.0)
                / F.count("*")
            ).alias("centroid_val")
        )
        .orderBy("label", "pos")
    )

@query(
    "sse_projection_sql",
    """
WITH top5 AS (
  SELECT doc_id,
         replace(replace(source, '\', '\\'), '"', '\"') AS src_esc,
         replace(replace(replace(text, ' ', '<SPECIAL_WHITE_SPACE>'),
                         '\', '\\'), '"', '\"') AS txt_esc
  FROM documents ORDER BY doc_id LIMIT 5),
ev AS (
  SELECT doc_id, 0 AS seq,
    '{"type":"create","id":"' || doc_id || '"}' AS event_json
  FROM top5
  UNION ALL
  SELECT doc_id, 1,
    '{"type":"createLink","id":"' || doc_id || '","link":"'
      || 'https://storage.example/pdfs/' || src_esc || '#page=' || doc_id
      || '"}'
  FROM top5
  UNION ALL
  SELECT doc_id, 2,
    '{"type":"addMessage","id":"' || doc_id || '","content":"'
      || txt_esc || '"}'
  FROM top5)
SELECT doc_id, CAST(seq AS INTEGER) AS seq, event_json
FROM ev ORDER BY doc_id, seq
""",
)
def sse_projection_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""SQL-expressible twin of the SSE serving projection (SURVEY.md §2A
    rows 24-28): create/createLink/addMessage JSON events built with
    explicit concatenation (engine-neutral bytes — SSEOpenAIController.java:
    186-239), the blob-URL #page anchor (:204-206), and the
    ``<SPECIAL_WHITE_SPACE>`` escape (:226-228), over the 5 lowest-id docs
    (stand-in for the top-5 hits so the embed UDF stays out of the oracle
    path).  String values get Gson-style ``\``/``"`` escaping
    (pipeline.json_escape) — mirrored literally in the oracle."""
    from ..pipeline import json_escape

    d = load_table(spark, sf_dir, "documents").orderBy("doc_id").limit(5)
    sid = F.col("doc_id").cast("string")
    link = F.concat(
        F.lit("https://storage.example/pdfs/"),
        json_escape("source"),
        F.lit("#page="),
        sid,
    )
    esc = json_escape(F.regexp_replace("text", " ", "<SPECIAL_WHITE_SPACE>"))
    events = F.array(
        F.concat(F.lit('{"type":"create","id":"'), sid, F.lit('"}')),
        F.concat(
            F.lit('{"type":"createLink","id":"'),
            sid,
            F.lit('","link":"'),
            link,
            F.lit('"}'),
        ),
        F.concat(
            F.lit('{"type":"addMessage","id":"'),
            sid,
            F.lit('","content":"'),
            esc,
            F.lit('"}'),
        ),
    )
    return (
        d.select("doc_id", F.posexplode(events).alias("seq", "event_json"))
        .withColumn("seq", F.col("seq").cast("int"))
        .select("doc_id", "seq", "event_json")
        .orderBy("doc_id", "seq")
    )

@query(
    "tpch_q6_forecast_revenue",
    """
SELECT (CAST(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) - (sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) % 1) AS BIGINT) AS DOUBLE) + CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) % 1 AS DOUBLE)) AS revenue,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive filter + global agg — every
    predicate pushes to the parquet scan, zero shuffles beyond the final
    single-row combine."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        F.expr(
            "l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' AND "
            "l_shipdate < TIMESTAMP '1996-01-01 00:00:00'"
        )
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        _dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count("*").alias("n"),
    )

@query(
    "tpch_q12_shipmode_priority",
    """
SELECT l_linestatus,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_linestatus ORDER BY l_linestatus
""",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + conditional counting."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' AND "
            "l_shipdate < TIMESTAMP '1996-01-01 00:00:00'"
        )
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )

@query(
    "tpch_q14_promo_effect",
    """
SELECT
  (CAST(CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
      ELSE CAST(0 AS DECIMAL(18,6)) END) - (sum(CASE WHEN p_type LIKE 'PROMO%'
      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
      ELSE CAST(0 AS DECIMAL(18,6)) END) % 1) AS BIGINT) AS DOUBLE) + CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
      ELSE CAST(0 AS DECIMAL(18,6)) END) % 1 AS DOUBLE)) AS promo_revenue,
  (CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) - (sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) % 1) AS BIGINT) AS DOUBLE) + CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) % 1 AS DOUBLE)) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
""",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: fact join to a broadcast dimension + conditional
    aggregation (the promo/total ratio is left to the caller so both
    aggregates stay exactly comparable)."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP '1995-09-01 00:00:00' AND "
            "l_shipdate < TIMESTAMP '1995-10-01 00:00:00'"
        )
    )
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(
        F.lit(0).cast(_DEC)
    )
    return l.join(F.broadcast(p), l.l_partkey == p.p_partkey).agg(
        _dec_to_double(F.sum(promo)).alias("promo_revenue"),
        _dec_to_double(F.sum(disc)).alias("total_revenue"),
    )

@query(
    "tpch_q18_large_volume_customers",
    """
SELECT c_custkey, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_totalprice,
  (CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) - (sum(CAST(l_quantity AS DECIMAL(18,6))) % 1) AS BIGINT) AS DOUBLE) + CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) % 1 AS DOUBLE)) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 150)
GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
""",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery over an aggregate (planned as a
    semi-join against the grouped lineitem) + 3-way join + top-20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        l.join(big.withColumnRenamed("l_orderkey", "__bk"),
               F.col("l_orderkey") == F.col("__bk"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )

@query(
    "tpch_q4_order_priority",
    """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a correlated non-equi predicate, planned
    as a left-semi join (equi key + residual condition), then a tiny agg.
    Adapted: fixtures lack commit/receipt dates, so "late" =
    l_shipdate > o_orderdate."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'"
            " AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'"
        )
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )

@query(
    "tpch_q7_nation_volume",
    """
SELECT supp_nation, cust_nation, l_year,
  (CAST(CAST(sum(CAST(volume AS DECIMAL(18,6))) - (sum(CAST(volume AS DECIMAL(18,6))) % 1) AS BIGINT) AS DOUBLE) + CAST(sum(CAST(volume AS DECIMAL(18,6))) % 1 AS DOUBLE)) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: 6-way join where only lineitem⋈orders is big-big;
    supplier/customer/nation are broadcast, and the nation-pair OR predicate
    is applied after the dimension joins (Catalyst pushes each half into the
    respective broadcast join where possible)."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"
            " AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'"
        )
    )
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair_ok)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )
