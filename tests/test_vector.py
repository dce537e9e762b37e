"""Vector distance expressions vs NumPy ground truth."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.functions import (
    vector as V,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.standard_normal(8).astype(np.float32)])
        for i in range(20)
    ]
    return spark.createDataFrame(rows, ["id", "v"]).cache()


def _pairs(spark, vec_df):
    a = vec_df.select(F.col("id").alias("ia"), F.col("v").alias("va"))
    b = vec_df.select(F.col("id").alias("ib"), F.col("v").alias("vb"))
    return a.crossJoin(b)


def test_l2_matches_numpy(spark, vec_df):
    got = (
        _pairs(spark, vec_df)
        .select("ia", "ib", "va", "vb", V.l2_distance("va", "vb").alias("d"))
        .collect()
    )
    for r in got:
        expect = float(np.linalg.norm(np.array(r["va"]) - np.array(r["vb"])))
        assert math.isclose(r["d"], expect, rel_tol=1e-9, abs_tol=1e-12)


def test_cosine_and_dot_match_numpy(spark, vec_df):
    got = (
        _pairs(spark, vec_df)
        .select(
            "va",
            "vb",
            V.cosine_distance("va", "vb").alias("cd"),
            V.dot_product("va", "vb").alias("dp"),
            V.neg_inner_product("va", "vb").alias("nip"),
        )
        .collect()
    )
    for r in got:
        va, vb = np.array(r["va"]), np.array(r["vb"])
        dp = float(va @ vb)
        cd = 1.0 - dp / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert math.isclose(r["dp"], dp, rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(r["nip"], -dp, rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(r["cd"], cd, rel_tol=1e-9, abs_tol=1e-9)


def test_vector_to_literal_shape(spark, vec_df):
    row = vec_df.select(V.vector_to_literal("v").alias("s")).first()
    assert row["s"].startswith("[") and row["s"].endswith("]")
    assert len(row["s"].split(", ")) == 8


def test_dim_check(spark):
    df = spark.createDataFrame([([1.0, 2.0],), ([1.0, 2.0, 3.0],)], ["v"])
    got = df.select(V.dim_check("v", 2).alias("ok")).collect()
    assert [r["ok"] for r in got] == [True, False]


def test_stays_native_no_python_udf(spark, vec_df):
    """Distance must remain a JVM expression — no BatchEvalPython /
    ArrowEvalPython node may appear in the physical plan."""
    df = vec_df.select(V.l2_distance("v", "v").alias("d"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
