"""Skew-handling primitives (SURVEY.md §4.4): salted aggregation and salted
broadcast-ables for hot keys.

AQE's skew-join handling covers sort-merge joins at runtime; salting is the
declarative tool for *aggregations* and for joins AQE can't split (e.g. a
hot grouping key where one token carries 1% of a 100 TB corpus).  Results
are exactly the input semantics — the salt only reshapes the shuffle — so
salted operators share their oracle with the unsalted form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_count", "salted_agg_sum"]


def _salt(n: int) -> Column:
    # Deterministic per-row salt (hash of the whole row's partition id would
    # do; spark_partition_id is cheapest and spreads uniformly here).
    return (F.spark_partition_id() % n).alias("__salt")


def salted_count(
    df: DataFrame, key_cols: list[str], salt_buckets: int = 16
) -> DataFrame:
    """groupBy(key).count() in two phases: (key, salt) partial counts, then
    key totals.  The first exchange spreads each hot key over
    ``salt_buckets`` reducers; the second aggregates ``salt_buckets`` rows
    per key — skew amortized at the cost of one extra (tiny) shuffle."""
    partial = (
        df.withColumn("__salt", _salt(salt_buckets))
        .groupBy(*key_cols, "__salt")
        .agg(F.count("*").alias("__c"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("__c").alias("count"))


def salted_agg_sum(
    df: DataFrame,
    key_cols: list[str],
    sum_col: Column,
    out_name: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted sum (decimal/long safe: sums re-associate exactly)."""
    partial = (
        df.withColumn("__salt", _salt(salt_buckets))
        .groupBy(*key_cols, "__salt")
        .agg(F.sum(sum_col).alias("__s"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("__s").alias(out_name))
