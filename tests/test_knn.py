"""kNN operators vs NumPy brute force, and plan-shape assertions
(TakeOrderedAndProject for top-k — SURVEY.md §4.2)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
    knn as K,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.tables import (
    load_table,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


def test_knn_matches_numpy(spark, emb, emb_np):
    ids, mat = emb_np
    probe = mat[ids == 0][0]
    got = K.knn(
        emb.filter(F.col("vec_id") != 0),
        [float(x) for x in probe],
        k=5,
        tie_cols=("vec_id",),
    ).collect()
    mask = ids != 0
    d = np.linalg.norm(mat[mask] - probe, axis=1)
    order = np.lexsort((ids[mask], d))
    expect = ids[mask][order[:5]].tolist()
    assert [r["vec_id"] for r in got] == expect
    np.testing.assert_allclose(
        [r["dist"] for r in got], np.sort(d)[:5], rtol=1e-9
    )


def test_knn_plan_is_take_ordered(spark, emb):
    df = K.knn(emb, [0.0] * 64, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_knn_join_matches_window_variant(spark, emb):
    probes = emb.filter(F.col("vec_id") < 5)
    items = emb.filter(F.col("vec_id") >= 5)
    kw = dict(k=3, metric="l2", probe_id="vec_id", item_id="vec_id")
    fast = K.knn_join(probes, items, shuffle_free=True, **kw)
    slow = K.knn_join(probes, items, shuffle_free=False, **kw)
    f = sorted((r["probe_id"], r["item_id"], r["rank"]) for r in fast.collect())
    s = sorted((r["probe_id"], r["item_id"], r["rank"]) for r in slow.collect())
    assert f == s


def test_knn_join_matches_numpy(spark, emb, emb_np):
    ids, mat = emb_np
    probes = emb.filter(F.col("vec_id") < 5)
    items = emb.filter(F.col("vec_id") >= 5)
    got = K.knn_join(
        probes, items, k=3, probe_id="vec_id", item_id="vec_id"
    ).collect()
    got_map = {}
    for r in got:
        got_map.setdefault(r["probe_id"], []).append((r["rank"], r["item_id"]))
    pmask, imask = ids < 5, ids >= 5
    for pid, pvec in zip(ids[pmask], mat[pmask]):
        d = np.linalg.norm(mat[imask] - pvec, axis=1)
        order = np.lexsort((ids[imask], d))
        expect = ids[imask][order[:3]].tolist()
        assert [i for _, i in sorted(got_map[pid])] == expect


def test_similarity_join_threshold(spark, emb, emb_np):
    ids, mat = emb_np
    left = emb.select(F.col("vec_id").alias("lid"), "embedding")
    right = emb.select(F.col("vec_id").alias("rid"), "embedding")
    got = K.similarity_join(
        left, right, threshold=6.0, metric="l2", left_id="lid", right_id="rid"
    ).collect()
    got_pairs = {(r["lid"], r["rid"]) for r in got}
    d = np.linalg.norm(mat[:, None, :] - mat[None, :, :], axis=2)
    expect = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(len(ids))
        if d[i, j] < 6.0
    }
    assert got_pairs == expect


def test_knn_pandas_impl_matches_native(spark, sf_dir):
    """impl='pandas' (NumPy scorer) must return the same top-k ids and
    4-decimal distances as the native expression."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.tables import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probe = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    items = emb.filter(F.col("vec_id") != 0)
    for metric in ["l2", "cosine", "dot"]:
        nat = K.knn(items, probe, k=5, metric=metric, tie_cols=("vec_id",)).collect()
        pnd = K.knn(items, probe, k=5, metric=metric, tie_cols=("vec_id",),
                    impl="pandas").collect()
        assert [r["vec_id"] for r in nat] == [r["vec_id"] for r in pnd], metric
        for a, b in zip(nat, pnd):
            assert round(a["dist"], 4) == round(b["dist"], 4), metric


def test_similarity_join_guard_fires_on_oversized_pairs(spark, emb):
    # VERDICT r02 #1: the exact all-pairs scorer must refuse a cartesian
    # it was never meant to run.  640 x 640 = 409,600 pairs > max_pairs=1000.
    with pytest.raises(ValueError, match="lsh_similarity_join"):
        K.similarity_join(
            emb.withColumnRenamed("vec_id", "left_id"),
            emb.withColumnRenamed("vec_id", "right_id"),
            threshold=1.0,
            max_pairs=1000,
            impl="native",
        )


def test_similarity_join_guard_disabled_with_none(spark, emb):
    small = emb.filter(F.col("vec_id") < 10)
    out = K.similarity_join(
        small.withColumnRenamed("vec_id", "left_id"),
        small.withColumnRenamed("vec_id", "right_id"),
        threshold=1e9,
        max_pairs=None,
        impl="native",
    )
    assert out.count() == 100  # all pairs under an infinite threshold


def _pairs(df):
    return {
        (r[0], r[1]): r[2] for r in df.collect()
    }


@pytest.mark.parametrize(
    "metric,threshold", [("l2", 6.0), ("cosine", 0.6), ("dot", -0.25)]
)
def test_blas_similarity_join_matches_native(spark, emb, metric, threshold):
    """The GEMM kernel must produce the native form's exact pair set with
    distances equal far beyond the 4-decimal rounding consumers apply."""
    left = emb.select(F.col("vec_id").alias("lid"), "embedding")
    right = emb.select(F.col("vec_id").alias("rid"), "embedding")
    kw = dict(metric=metric, left_id="lid", right_id="rid")
    nat = _pairs(
        K.similarity_join(
            left, right, threshold, impl="native", max_pairs=None, **kw
        )
    )
    gem = _pairs(K.similarity_join(left, right, threshold, impl="blas", **kw))
    assert set(nat) == set(gem)
    # l2 uses the |a|^2 - 2ab + |b|^2 expansion whose cancellation (then
    # sqrt) costs ~1e-8 absolute vs the native elementwise-difference form;
    # cosine/dot agree to ~1e-14.  Both are far inside the 4-decimal
    # rounding every consumer applies.
    assert max(abs(nat[p] - gem[p]) for p in nat) < 5e-7


def test_blas_similarity_join_swaps_to_broadcast_smaller_side(spark, emb):
    """Asymmetric sides: the kernel broadcasts whichever side is smaller
    and must emit identical (left, right) orientation either way."""
    big = emb.select(F.col("vec_id").alias("lid"), "embedding")
    small = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("rid"), "embedding"
    )
    kw = dict(metric="l2", threshold=6.0, dist_col="dist")
    fwd = _pairs(
        K.blas_similarity_join(
            big, small, left_id="lid", right_id="rid", **kw
        )
    )
    # Same join with roles reversed: the smaller side is now `left`.
    rev = _pairs(
        K.blas_similarity_join(
            small.withColumnRenamed("rid", "lid"),
            big.withColumnRenamed("lid", "rid"),
            left_id="lid",
            right_id="rid",
            **kw,
        )
    )
    assert set(fwd) == {(b, a) for a, b in rev}


def test_similarity_join_auto_dispatch(spark, emb):
    left = emb.withColumnRenamed("vec_id", "left_id")
    right = emb.withColumnRenamed("vec_id", "right_id")
    # Small inputs: native codegen form — no Python workers in the plan.
    small = K.similarity_join(
        left.limit(10), right.limit(10), threshold=6.0
    )
    assert "MapInPandas" not in small._jdf.queryExecution().executedPlan().toString()
    # Past max_native_pairs: the GEMM kernel takes over.
    big = K.similarity_join(
        left, right, threshold=6.0, max_native_pairs=1000
    )
    assert "MapInPandas" in big._jdf.queryExecution().executedPlan().toString()
    # Neither side broadcastable: loud refusal pointing at the scale paths.
    with pytest.raises(ValueError, match="lsh_similarity_join"):
        K.similarity_join(
            left, right, threshold=6.0, max_native_pairs=1000,
            max_broadcast_rows=10,
        )


def test_knn_join_probe_cap_fires(spark, emb):
    # VERDICT r02 #2: the "small by contract" probe collect is enforced.
    with pytest.raises(ValueError, match="max_rows"):
        K.knn_join(
            emb.withColumnRenamed("vec_id", "probe_id"),
            emb.withColumnRenamed("vec_id", "item_id"),
            probe_id="probe_id",
            item_id="item_id",
            max_probe_rows=10,
        )


def test_similarity_join_sizes_param_drives_dispatch(spark):
    """Caller-provided sizes must be BELIEVED (zero eager actions): fake
    over-limit sizes on tiny frames force the loud refusal, and fake
    small sizes keep the native path (VERDICT r03 #2)."""
    import pytest

    items = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    l = items.select(F.col("vec_id").alias("left_id"), "embedding")
    r = items.select(F.col("vec_id").alias("right_id"), "embedding")
    with pytest.raises(ValueError, match="compute-infeasible"):
        K.similarity_join(
            l, r, threshold=10.0, sizes=(2_000_000, 2_000_000)
        )
    out = K.similarity_join(l, r, threshold=10.0, sizes=(2, 2)).collect()
    assert len(out) == 4  # all pairs within threshold 10
