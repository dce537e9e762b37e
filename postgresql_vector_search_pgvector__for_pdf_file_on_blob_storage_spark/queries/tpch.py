"""Derived partsupp + the TPC-H shapes that need it (Q2/Q9/Q11/Q16/Q20) and the rest of the suite.

Mechanical split of the former single-file queries.py (round 9) — the
section bodies are verbatim; only relative-import depth changed.
"""

from __future__ import annotations

from ._core import *  # noqa: F401,F403
from .relational import _DEC, _dec_to_double, _dsum  # noqa: F401


# ---------------------------------------------------------------------------
# Derived partsupp (VERDICT r7 next-round #3): the driver fixture
# pre-registers exactly ten views — partsupp cannot ship as a table — so
# both engines DERIVE the identical FK-consistent partsupp from
# part x supplier: dbgen's four-suppliers-per-part distribution restated
# over 0-based key RANKS (robust to offset key spaces like the scaled
# fixtures'), with integer-formula availqty / supplycost (two-decimal
# doubles — exact under the DECIMAL(18,6) sum contract).  This makes
# TPC-H q2/q9/q11/q16 run their FAITHFUL shapes (the four were
# lineitem-derived analogs through r7).  The rank windows run over the
# two smallest dimensions only; at a real deployment partsupp is a
# first-class table and these queries take it directly.
# ---------------------------------------------------------------------------

_SQL_PARTSUPP = """\
__sc AS (SELECT count(*) AS c FROM supplier),
__sr AS (
  SELECT s_suppkey, row_number() OVER (ORDER BY s_suppkey) - 1 AS srk
  FROM supplier),
__pr AS (
  SELECT p_partkey, row_number() OVER (ORDER BY p_partkey) - 1 AS prk
  FROM part),
__ps0 AS (
  SELECT DISTINCT pr.p_partkey, pr.prk,
         (pr.prk + t.i * (__sc.c // 4) + (pr.prk // __sc.c)) % __sc.c AS srk
  FROM __pr pr, range(0, 4) t(i), __sc),
partsupp AS (
  SELECT ps.p_partkey AS ps_partkey,
         sr.s_suppkey AS ps_suppkey,
         CAST((ps.prk * 47 + ps.srk * 31) % 9999 + 1 AS INTEGER)
           AS ps_availqty,
         CAST((ps.prk * 61 + ps.srk * 17) % 92000 + 100 AS DOUBLE) / 100.0
           AS ps_supplycost
  FROM __ps0 ps JOIN __sr sr USING (srk))"""

def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_SQL_PARTSUPP`` (section comment above): columns
    ``ps_partkey, ps_suppkey, ps_availqty, ps_supplycost``.  Pure
    integer arithmetic up to one final /100.0, so every value is
    bit-identical across engines; the (partkey, suppkey) pairs are
    distinct by construction for any supplier count >= 4 (stride
    S div 4 between the four i-draws) and the DISTINCT guard keeps the
    PK even below that."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey")
    sc_cnt = s.count()
    # Ranks as LONG: row_number() is IntegerType and prk*61 would wrap
    # int32 past ~35M parts (~sf175) in non-ANSI Spark while the DuckDB
    # twin's row_number is BIGINT — the widened rank keeps the formula
    # bit-identical at any fixture scale.
    sr = s.withColumn(
        "srk",
        (F.row_number().over(Window.orderBy("s_suppkey")) - 1).cast("long"),
    )
    pr = p.withColumn(
        "prk",
        (F.row_number().over(Window.orderBy("p_partkey")) - 1).cast("long"),
    )
    i = spark.range(4).select(F.col("id").alias("i"))
    ps0 = (
        pr.crossJoin(F.broadcast(i))
        .withColumn(
            "srk",
            F.expr(
                f"(prk + i * {sc_cnt // 4} + (prk div {sc_cnt}))"
                f" % {sc_cnt}"
            ),
        )
        .select("p_partkey", "prk", "srk")
        .distinct()
    )
    return ps0.join(F.broadcast(sr), "srk").select(
        F.col("p_partkey").alias("ps_partkey"),
        F.col("s_suppkey").alias("ps_suppkey"),
        ((F.col("prk") * 47 + F.col("srk") * 31) % 9999 + 1)
        .cast("int")
        .alias("ps_availqty"),
        (
            ((F.col("prk") * 61 + F.col("srk") * 17) % 92000 + 100).cast(
                "double"
            )
            / 100.0
        ).alias("ps_supplycost"),
    )

@query(
    "tpch_q2_min_cost_supplier",
    """
WITH """ + _SQL_PARTSUPP + """,
costs AS (
  SELECT ps.ps_partkey, ps.ps_supplycost,
         s.s_acctbal, s.s_name, n.n_name
  FROM partsupp ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'),
best AS (
  SELECT ps_partkey, min(ps_supplycost) AS best_cost
  FROM costs GROUP BY ps_partkey)
SELECT c.s_acctbal, c.s_name, c.n_name AS nation, p.p_partkey,
       c.ps_supplycost AS supply_cost
FROM costs c
JOIN best b ON c.ps_partkey = b.ps_partkey
           AND c.ps_supplycost = b.best_cost
JOIN part p ON p.p_partkey = c.ps_partkey
WHERE p.p_size = 15
ORDER BY s_acctbal DESC, nation, s_name, p_partkey LIMIT 100
""",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2, FAITHFUL shape (r08 — derived partsupp, section comment
    above): per-part minimum supply cost within a region over
    partsupp x supplier, via correlated-min decorrelated into agg +
    equality back-join.  The min of a set of doubles is an element of
    the set, so the equality join selects identical rows on both
    engines.  Reference parity: the region-restricted min-cost-supplier
    subquery is the canonical TPC-H Q2."""
    ps = _partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    costs = (
        ps.join(
            F.broadcast(s.select("s_suppkey", "s_nationkey", "s_acctbal",
                                 "s_name")),
            ps.ps_suppkey == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(n.select("n_nationkey", "n_regionkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name",
                "n_name")
    )
    best = costs.groupBy(F.col("ps_partkey").alias("__bpk")).agg(
        F.min("ps_supplycost").alias("best_cost")
    )
    return (
        costs.join(
            best,
            (costs.ps_partkey == F.col("__bpk"))
            & (costs.ps_supplycost == F.col("best_cost")),
        )
        .join(
            F.broadcast(p.select("p_partkey")),
            costs.ps_partkey == F.col("p_partkey"),
        )
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            F.col("ps_supplycost").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "nation", "s_name", "p_partkey")
        .limit(100)
    )

@query(
    "tpch_q9_product_type_profit",
    """
WITH """ + _SQL_PARTSUPP + """
SELECT nation, o_year,
  (CAST(CAST(sum(CAST(amount AS DECIMAL(18,6))) - (sum(CAST(amount AS DECIMAL(18,6))) % 1) AS BIGINT) AS DOUBLE) + CAST(sum(CAST(amount AS DECIMAL(18,6))) % 1 AS DOUBLE)) AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         l.l_extendedprice * (1 - l.l_discount)
           - ps.ps_supplycost * l.l_quantity AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN partsupp ps ON ps.ps_suppkey = l.l_suppkey
                  AND ps.ps_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%gear%')
GROUP BY nation, o_year ORDER BY nation, o_year DESC
""",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9, FAITHFUL shape (r08 — derived partsupp): profit per
    nation per year with the REAL ``ps_supplycost`` term joined on
    (l_partkey, l_suppkey) — the canonical five-way Q9 join graph.  The
    per-row amount is a fixed IEEE expression; sums go through DECIMAL.
    (The fixture's lineitem draws (part, supplier) pairs independently,
    so the partsupp join keeps the ~1/S pair subset it covers —
    identical on both engines.)"""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    ps = _partsupp(spark, sf_dir)
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("ps_supplycost") * F.col("l_quantity")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(
            # No broadcast hint: partsupp scales as 4 x |part| (a fact
            # table, not a dim) — the composite-key shuffle join is the
            # plan that survives scale; AQE still broadcasts it at
            # fixture sizes.
            ps,
            (l.l_suppkey == F.col("ps_suppkey"))
            & (l.l_partkey == F.col("ps_partkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(_dsum(amount).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )

@query(
    "tpch_q11_important_stock",
    """
WITH """ + _SQL_PARTSUPP + """,
val AS (
  SELECT ps.ps_partkey,
         sum(CAST(ps.ps_supplycost * ps.ps_availqty AS DECIMAL(18,6)))
           AS v
  FROM partsupp ps
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_5'
  GROUP BY ps.ps_partkey)
SELECT ps_partkey, CAST(v AS DOUBLE) AS value
FROM val
WHERE 2000 * v > (SELECT sum(v) FROM val)
ORDER BY value DESC, ps_partkey
""",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11, FAITHFUL shape (r08 — derived partsupp): per-part
    stock value ``ps_supplycost * ps_availqty`` for one nation's
    suppliers, kept when above a fixed fraction of the total — the
    canonical Q11 HAVING-over-global-sum.  The threshold comparison
    stays in DECIMAL (2000*v > sum) — no float fraction, so the cut is
    exact on both engines."""
    ps = _partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_5"
    )
    val = (
        ps.join(
            F.broadcast(s.select("s_suppkey", "s_nationkey")),
            ps.ps_suppkey == F.col("s_suppkey"),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                (F.col("ps_supplycost") * F.col("ps_availqty")).cast(_DEC)
            ).alias("v")
        )
    )
    total = val.agg(F.sum("v").alias("__t"))
    return (
        val.join(F.broadcast(total))
        .filter(F.lit(2000) * F.col("v") > F.col("__t"))
        .select("ps_partkey", F.col("v").cast("double").alias("value"))
        .orderBy(F.desc("value"), "ps_partkey")
    )

@query(
    "tpch_q16_supplier_count",
    """
WITH """ + _SQL_PARTSUPP + """
SELECT p.p_brand, p.p_type, p.p_size,
  CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp ps JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND ps.ps_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 50
""",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16, FAITHFUL shape (r08 — derived partsupp): distinct
    supplier counts per part attribute group over partsupp, excluding
    flagged suppliers (negative balance as the complaints analog) via a
    NOT IN anti-join — the canonical Q16."""
    ps = _partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        ps.join(bad, ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt")
        )
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(50)
    )

@query(
    "tpch_q10_returned_items",
    """
SELECT c.c_custkey, c.c_name,
  (CAST(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) - (sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) % 1) AS BIGINT) AS DOUBLE) + CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) % 1 AS DOUBLE)) AS revenue,
  c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
""",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer — one big-big
    join (lineitem⋈orders, both pre-filtered) + two broadcasts + top-20."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'"
            " AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"
        )
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )

@query(
    "tpch_q13_custdist",
    """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
""",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count distribution.  Instead of the literal
    outer-join-then-count (which shuffles every order row keyed by
    customer), aggregate orders per customer FIRST, then broadcast-join the
    small per-customer counts — the agg-below-join rewrite that matters at
    100 TB (shuffle carries one row per customer, not per order)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = o.groupBy(F.col("o_custkey")).agg(
        F.count("*").alias("__n")
    )
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left_outer")
        .select(F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )

@query(
    "tpch_q15_top_supplier",
    """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s.s_suppkey
""",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: agg -> scalar max over the agg -> equality back-join.
    The max comparison stays in DECIMAL (exact) and only the output casts to
    double, so ties/equality are engine-independent."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'"
            " AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'"
        )
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))
        .alias("__rev")
    )
    best = rev.agg(F.max("__rev").alias("__best"))
    return (
        rev.join(F.broadcast(best), F.col("__rev") == F.col("__best"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("__rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )

@query(
    "tpch_q17_small_quantity_revenue",
    """
SELECT (CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) - (sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) % 1) AS BIGINT) AS DOUBLE) + CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) % 1 AS DOUBLE)) / 7.0 AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#2' AND p.p_size < 10
  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
""",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average.  The subquery is
    decorrelated into a pre-aggregation keyed by partkey, computed only for
    partkeys that survive the broadcast part filter (semantically identical:
    the outer join already restricts to those parts).  l_quantity values are
    small integers stored as doubles, so their sum/avg is exact in IEEE
    double regardless of order — safe to compare across engines."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#2") & (F.col("p_size") < 10)
    ).select("p_partkey")
    l = load_table(spark, sf_dir, "lineitem")
    lp = l.join(F.broadcast(p), l.l_partkey == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresh = lp.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("__cut")
    )
    return (
        lp.join(F.broadcast(thresh), F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__cut"))
        .agg(
            (_dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly")
        )
    )

@query(
    "tpch_q19_discounted_revenue",
    """
SELECT (CAST(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) - (sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) % 1) AS BIGINT) AS DOUBLE) + CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) % 1 AS DOUBLE)) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-attribute predicate across both
    join sides.  The part side of the OR is pre-filtered (union of brand
    windows) so the broadcast build is small; the residual quantity clauses
    evaluate post-join."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35))
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )

@query(
    "tpch_q8_market_share",
    """
WITH allnations AS (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
SELECT o_year,
  (CAST(CAST(sum(CASE WHEN nation = 'NATION_3'
                THEN CAST(volume AS DECIMAL(18,6))
                ELSE CAST(0 AS DECIMAL(18,6)) END) - (sum(CASE WHEN nation = 'NATION_3'
                THEN CAST(volume AS DECIMAL(18,6))
                ELSE CAST(0 AS DECIMAL(18,6)) END) % 1) AS BIGINT) AS DOUBLE) + CAST(sum(CASE WHEN nation = 'NATION_3'
                THEN CAST(volume AS DECIMAL(18,6))
                ELSE CAST(0 AS DECIMAL(18,6)) END) % 1 AS DOUBLE))
    / (CAST(CAST(sum(CAST(volume AS DECIMAL(18,6))) - (sum(CAST(volume AS DECIMAL(18,6))) % 1) AS BIGINT) AS DOUBLE) + CAST(sum(CAST(volume AS DECIMAL(18,6))) % 1 AS DOUBLE)) AS mkt_share
FROM allnations GROUP BY o_year ORDER BY o_year
""",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-way join (one big-big lineitem⋈orders; part,
    supplier, customer, both nations, region broadcast) feeding a
    conditional-share aggregate.  Both sums are decimal-exact; the share is
    one double division."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
            " AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"
        )
    )
    l = load_table(spark, sf_dir, "lineitem")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"),
                  F.col("n_regionkey").alias("n1_region"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"),
                  F.col("n_name").alias("nation"))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                _dec_to_double(
                    F.sum(
                        F.when(F.col("nation") == "NATION_3", vol).otherwise(
                            F.lit(0).cast(_DEC)
                        )
                    )
                )
                / _dec_to_double(F.sum(vol))
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )

@query(
    "tpch_q20_dominant_supplier",
    """
WITH """ + _SQL_PARTSUPP + """,
shipped AS (
  SELECT l.l_partkey, l.l_suppkey,
         sum(CAST(l.l_quantity AS DECIMAL(18,6))) AS sq
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_partkey, l.l_suppkey)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM partsupp ps
JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_type = 'ECONOMY'
JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
               AND sh.l_suppkey = ps.ps_suppkey
JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
WHERE 2 * ps.ps_availqty > sh.sq
ORDER BY s.s_suppkey
""",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20, FAITHFUL shape (r08 — derived partsupp, section
    comment above _SQL_PARTSUPP): suppliers whose ``ps_availqty``
    exceeds half the 1997 shipped quantity of that (part, supplier)
    pair — the canonical Q20 correlated-availqty test, decorrelated
    into a grouped sum + equality join.  The dominance comparison is
    ``2 * ps_availqty > sq`` with an INT left side against the DECIMAL
    sum — exact on both engines."""
    ps = _partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    )
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'"
            " AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'"
        )
    )
    shipped = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(_DEC)).alias("sq")
    )
    return (
        ps.join(
            F.broadcast(p.select("p_partkey")),
            ps.ps_partkey == F.col("p_partkey"),
        )
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.lit(2) * F.col("ps_availqty") > F.col("sq"))
        .join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )

@query(
    "tpch_q21_waiting_supplier",
    """
WITH l AS (
  SELECT li.l_orderkey, li.l_suppkey, li.l_shipdate, o.o_orderdate
  FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'),
cand AS (
  SELECT DISTINCT a.l_orderkey, a.l_suppkey
  FROM l a
  WHERE a.l_shipdate > a.o_orderdate + INTERVAL 60 DAY
    AND EXISTS (SELECT 1 FROM l b
                WHERE b.l_orderkey = a.l_orderkey
                  AND b.l_suppkey <> a.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM l c
                    WHERE c.l_orderkey = a.l_orderkey
                      AND c.l_suppkey <> a.l_suppkey
                      AND c.l_shipdate > c.o_orderdate + INTERVAL 60 DAY))
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM cand JOIN supplier s ON cand.l_suppkey = s.s_suppkey
GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 20
""",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole late supplier in a multi-supplier order.
    Adapted: fixtures lack commit/receipt dates, so "late" = shipped more
    than 60 days after the order date.  The oracle states it with
    EXISTS/NOT EXISTS; the engine decorrelates both into ONE per-order
    aggregation (distinct suppliers, distinct late suppliers) joined back —
    at 100 TB that is one shuffle of per-order counters instead of two
    self-joins of lineitem."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    l = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("late"),
    )
    stats = l.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("__ns"),
        F.countDistinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("__nl"),
    )
    cand = (
        l.filter(F.col("late"))
        .join(stats.withColumnRenamed("l_orderkey", "__ok"),
              F.col("l_orderkey") == F.col("__ok"))
        .filter((F.col("__ns") > 1) & (F.col("__nl") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        cand.join(F.broadcast(s), cand.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )

@query(
    "window_trailing_10min",
    """
SELECT event_id, user_id,
  CAST(sum(CAST(value AS DECIMAL(18,6)))
       OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS trailing_sum,
  CAST(count(*)
       OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS BIGINT)
    AS n_in_window
FROM events ORDER BY user_id, event_id
""",
)
def window_trailing_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (SURVEY.md §2B B9): per-user trailing-10-minute
    sum/count over event time.  The frame is on epoch microseconds so both
    engines bound it identically (RANGE peers handled the same)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(_DEC)).over(w).cast("double").alias(
            "trailing_sum"
        ),
        F.count("*").over(w).cast("long").alias("n_in_window"),
    ).orderBy("user_id", "event_id")

@query(
    "tpch_q22_global_sales_opportunity",
    """
WITH pool AS (
  SELECT CAST(c_custkey % 7 AS INTEGER) AS cntrycode, c_custkey, c_acctbal
  FROM customer WHERE c_custkey % 7 IN (1, 3, 5)),
cutoff AS (
  SELECT (CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) - (sum(CAST(c_acctbal AS DECIMAL(18,6))) % 1) AS BIGINT) AS DOUBLE) + CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) % 1 AS DOUBLE)) / count(*) AS avg_bal
  FROM pool WHERE c_acctbal > 0.0)
SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       (CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) - (sum(CAST(c_acctbal AS DECIMAL(18,6))) % 1) AS BIGINT) AS DOUBLE) + CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) % 1 AS DOUBLE)) AS totacctbal
FROM pool, cutoff
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = pool.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY cntrycode ORDER BY cntrycode
""",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery cutoff + NOT EXISTS anti-join.
    Adapted: fixtures lack phone country codes, so cntrycode =
    c_custkey % 7 restricted to {1,3,5}; and since every fixture customer
    has orders, "no orders" is narrowed to "no URGENT orders" to keep the
    anti-join selective but non-empty.  The average is an exact decimal sum
    divided once in double, so the > comparison is engine-independent."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    pool = c.filter((F.col("c_custkey") % 7).isin(1, 3, 5)).select(
        (F.col("c_custkey") % 7).cast("int").alias("cntrycode"),
        "c_custkey",
        "c_acctbal",
    )
    cutoff = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (_dsum(F.col("c_acctbal")) / F.count("*")).alias("avg_bal")
    )
    return (
        pool.join(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, pool.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )

@query(
    "correlated_scalar_subquery",
    """
SELECT o_orderkey, o_totalprice
FROM orders o
WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
ORDER BY o_orderkey
""",
)
def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — same SQL text runs on both engines;
    Spark decorrelates it into an aggregate + join.  avg is double-only
    here because the predicate (strict >) is tolerant of last-ulp
    differences only when values are far from the boundary; the 2x factor
    keeps it far."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice) FROM orders o2
                                  WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o_orderkey
        """
    )
