"""Physical-plan inspection helpers.

The 100 TB design contract is checked here, not hand-waved: filters reach
the parquet scan (``PushedFilters``), projections prune columns
(``ReadSchema``), small sides broadcast, top-k compiles to
``TakeOrderedAndProject``, and hot-path expressions stay out of Python.
Tests call these on real operator plans; tuning sessions use
``summarize_plan`` interactively.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "plan_string",
    "optimized_plan_string",
    "has_pushed_filter",
    "read_schema_columns",
    "has_broadcast_join",
    "has_take_ordered",
    "python_eval_nodes",
    "num_exchanges",
    "summarize_plan",
    "plan_signature",
    "SIGNATURE_OPS",
]


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    if mode == "formatted":
        return _formatted(df)
    return _executed(df)


def _executed(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan_string(df: DataFrame) -> str:
    """Catalyst's optimized *logical* plan — the right level for asserting
    rewrites like agg-below-join, where physical operator names vary with
    AQE decisions."""
    return df._jdf.queryExecution().optimizedPlan().toString()


def _formatted(df: DataFrame) -> str:
    # Spark's EXPLAIN FORMATTED via the SQL path (stable public surface).
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan's PushedFilters mention ``fragment``."""
    plan = _formatted(df)
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        if fragment in m.group(1):
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read from each parquet scan (pruning proof)."""
    plan = _formatted(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", plan):
        out.append([c.split(":")[0] for c in m.group(1).split(",") if c])
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in _executed(df) or "BroadcastNestedLoopJoin" in _executed(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in _executed(df)


def python_eval_nodes(df: DataFrame) -> list[str]:
    """Python-boundary operators in the plan (BatchEvalPython =
    row-at-a-time UDF, ArrowEvalPython / MapInPandas = vectorized).  The
    hot relational path must return [] — Python appears only where
    semantics require it (chunker, embedder, media codecs)."""
    plan = _executed(df)
    return re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)", plan)


def num_exchanges(df: DataFrame) -> int:
    """Shuffle count in the executed plan (before AQE reuse)."""
    return _executed(df).count("Exchange")


def summarize_plan(df: DataFrame) -> dict:
    return {
        "broadcast_join": has_broadcast_join(df),
        "take_ordered": has_take_ordered(df),
        "python_nodes": python_eval_nodes(df),
        "exchanges": num_exchanges(df),
        "read_schemas": read_schema_columns(df),
    }


# Operators that define a plan's scale shape: exchanges (shuffles), join
# strategies, aggregation/window/sort operators, Python boundaries, and
# row-generating nodes.  Everything else (Project/Filter/Scan details) is
# free to evolve without breaking the signature.
SIGNATURE_OPS = frozenset(
    {
        "Exchange",
        "BroadcastExchange",
        "Sort",
        "SortMergeJoin",
        "BroadcastHashJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
        "HashAggregate",
        "ObjectHashAggregate",
        "SortAggregate",
        "Window",
        "WindowGroupLimit",
        "TakeOrderedAndProject",
        "ArrowEvalPython",
        "BatchEvalPython",
        "FlatMapGroupsInPandas",
        "MapInPandas",
        "Generate",
        "Expand",
    }
)

_OP_LINE = re.compile(r"^[\s:+*\-]*(?:\([0-9]+\) )?([A-Za-z]+)")


def plan_signature(df: DataFrame) -> dict[str, int]:
    """Count the scale-defining physical operators in the (pre-AQE)
    executed plan.  The signature pins a query's SHAPE — how many
    shuffles, which join strategy, where Python intrudes — so a plan
    regression (a broadcast silently degrading to sort-merge, an extra
    exchange) fails tests even while results stay correct.  Golden values
    live in tests/golden_plans.json (regenerate with
    scripts/gen_plan_goldens.py after reviewing any intentional change).
    """
    counts: dict[str, int] = {}
    for line in _executed(df).splitlines():
        m = _OP_LINE.match(line)
        if not m:
            continue
        op = m.group(1)
        if op in SIGNATURE_OPS:
            counts[op] = counts.get(op, 0) + 1
    return dict(sorted(counts.items()))
