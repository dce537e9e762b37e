"""User-extensible function surface (SURVEY.md §2B B14).

The reference hard-codes every transformation in Java; the engine exposes
the full Spark extension ladder instead, demonstrated here with working
examples of each rung:

- scalar pandas UDF (Arrow-batched)           -> ``token_count_udf``
- grouped-aggregate pandas UDF (a UDAF)       -> ``geometric_mean_udaf``
- Python UDTF (table function, Spark >= 3.5)  -> ``ChunkTextUDTF``

plus registration helpers so SQL users can call them
(``register_all(spark)`` -> ``SELECT chunk_idx, chunk FROM chunk_text(...)``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import split_text_py

__all__ = ["token_count_udf", "geometric_mean_udaf", "ChunkTextUDTF", "register_all"]


@F.pandas_udf(T.IntegerType())
def token_count_udf(texts: pd.Series) -> pd.Series:
    """Scalar pandas UDF: whitespace token count (the native-expression twin
    lives in functions.text.token_count — this one exists to demonstrate and
    test the Arrow scalar-UDF rung)."""
    return texts.fillna("").str.split().str.len().astype("int32")


@F.pandas_udf(T.DoubleType())
def geometric_mean_udaf(v: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (UDAF): exp(mean(log x)) over positive
    values — an aggregate Spark has no builtin for."""
    x = v[v > 0]
    if len(x) == 0:
        return float("nan")
    return float(np.exp(np.log(x.astype(float)).mean()))


class ChunkTextUDTF:
    """Python UDTF: explode one text into the reference's punctuation-aware
    chunks (Function.java:214-251) with chunk indexes.

    SQL: ``SELECT t.* FROM chunk_text('some text', 120, 20) t`` or laterally
    against a table via ``LATERAL chunk_text(text, 7500, 300)``.
    """

    @staticmethod
    def analyze(*args):  # pragma: no cover - only used by Spark's planner
        from pyspark.sql.udtf import AnalyzeResult

        return AnalyzeResult(
            T.StructType()
            .add("chunk_idx", T.IntegerType())
            .add("chunk", T.StringType())
        )

    def eval(self, text: str, max_len: int = 7500, floor_delta: int = 300):
        if text is None:
            return
        for i, chunk in enumerate(split_text_py(text, max_len, floor_delta)):
            yield i, chunk


def register_all(spark: SparkSession) -> None:
    """Expose the extension surface to SQL."""
    from pyspark.sql.functions import udtf

    spark.udf.register("token_count_py", token_count_udf)
    spark.udf.register("geometric_mean", geometric_mean_udaf)
    spark.udtf.register("chunk_text", udtf(ChunkTextUDTF))
