"""Semantic dedup (SemDeDup): planted duplicate groups must be found and
collapsed to min-id keepers; the cluster approximation's recall vs the
exact similarity join is measured, not assumed; the quadratic-cluster
guard must refuse loudly."""

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
    ann as A,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
    knn as K,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
    semdedup as S,
)


def _planted(spark):
    """3 duplicate groups of 4 near-identical vectors + 8 unique vectors,
    well-separated in 8-d."""
    rows = []
    base = {
        0: [1.0, 0, 0, 0, 0, 0, 0, 0],
        1: [0, 1.0, 0, 0, 0, 0, 0, 0],
        2: [0, 0, 1.0, 0, 0, 0, 0, 0],
    }
    vid = 0
    for g, v in base.items():
        for j in range(4):
            jit = [x + 0.001 * ((vid * 7 + i) % 3) for i, x in enumerate(v)]
            rows.append((vid, jit, g))
            vid += 1
    for u in range(8):
        v = [0.0] * 8
        v[3 + (u % 5)] = 1.0
        v[(u * 3) % 3] = 0.5 if u % 2 else -0.5
        rows.append((vid, v, 100 + u))
        vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )


def test_semantic_dedup_collapses_planted_groups(spark):
    df = _planted(spark)
    out = {
        r["vec_id"]: r
        for r in S.semantic_dedup(
            df, eps=0.05, k_clusters=6, id_col="vec_id"
        ).collect()
    }
    assert len(out) == df.count()
    # each planted group of 4 collapses to one keeper = min id
    for g in range(3):
        ids = [g * 4 + j for j in range(4)]
        groups = {out[i]["group_id"] for i in ids}
        assert groups == {min(ids)}, groups
        assert [out[i]["is_keeper"] for i in ids] == [
            i == min(ids) for i in ids
        ]
    # uniques keep themselves
    for i in range(12, 20):
        assert out[i]["group_id"] == i and out[i]["is_keeper"]


def test_semantic_dedup_with_centroids_matches_planted(spark):
    """The frozen-centroid form (the oracle row's entry point) runs the
    identical tail: planted groups collapse to min-id keepers when the
    centroids are the planted bases themselves, NULL embeddings pass
    through as their own keepers with NULL cluster, and a wrong-cluster
    split (each group its own centroid) still finds within-cluster
    duplicates."""
    df = _planted(spark).unionByName(
        spark.createDataFrame(
            [(99, None, 999)], "vec_id long, embedding array<float>, label long"
        )
    )
    cents = [
        [1.0, 0, 0, 0, 0, 0, 0, 0],
        [0, 1.0, 0, 0, 0, 0, 0, 0],
        [0, 0, 1.0, 0, 0, 0, 0, 0],
        [0, 0, 0, 1.0, 0, 0, 0, 0],
        [0, 0, 0, 0, 1.0, 0, 0, 0],
        [0, 0, 0, 0, 0, 1.0, 0, 0],
    ]
    out = {
        r["vec_id"]: r
        for r in S.semantic_dedup_with_centroids(
            df, cents, eps=0.05, id_col="vec_id"
        ).collect()
    }
    assert len(out) == 21
    for g in range(3):
        ids = [g * 4 + j for j in range(4)]
        assert {out[i]["group_id"] for i in ids} == {min(ids)}
        assert {out[i]["cluster_id"] for i in ids} == {g}
    for i in range(12, 20):
        assert out[i]["group_id"] == i and out[i]["is_keeper"]
    assert out[99]["cluster_id"] is None
    assert out[99]["group_id"] == 99 and out[99]["is_keeper"]


def test_semantic_dup_edges_recall_vs_exact(spark):
    """On clustered data the within-cluster scan must recover nearly all
    exact cosine-duplicate pairs (the paper's approximation, measured).
    k-means(k=16) on 16 true centers separates them, so recall is 1.0."""
    items = A.synthetic_clustered_vectors(
        spark, 400, dim=16, n_centers=16, noise=0.02
    )
    eps = 0.05
    exact = {
        (r["left_id"], r["right_id"])
        for r in K.similarity_join(
            items.select(F.col("vec_id").alias("left_id"), "embedding"),
            items.select(F.col("vec_id").alias("right_id"), "embedding"),
            threshold=eps,
            metric="cosine",
        )
        .filter(F.col("left_id") < F.col("right_id"))
        .collect()
    }
    assigned = S.cluster_assign(items, k_clusters=16)
    got = {
        (r["id_a"], r["id_b"])
        for r in S.semantic_dup_edges(assigned, eps=eps).collect()
    }
    assert exact, "fixture produced no exact duplicate pairs"
    assert got <= exact  # within-cluster pairs are a subset of exact
    recall = len(got & exact) / len(exact)
    assert recall == 1.0, f"recall {recall} on separable clusters"


def test_semantic_dup_edges_cluster_cap_raises(spark):
    items = A.synthetic_clustered_vectors(
        spark, 100, dim=8, n_centers=2, noise=0.01
    )
    assigned = S.cluster_assign(items, k_clusters=2)
    with pytest.raises(Exception, match="max_cluster_size"):
        S.semantic_dup_edges(
            assigned, eps=0.05, max_cluster_size=10
        ).collect()


def test_semantic_dedup_plan_shape(spark):
    """One corpus-wide exchange to co-locate clusters feeding the pandas
    GEMM — the edge scan must not add extra shuffles of the vectors."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.plans import (
        explain as E,
    )

    items = A.synthetic_clustered_vectors(
        spark, 200, dim=8, n_centers=4, noise=0.01
    )
    assigned = S.cluster_assign(items, k_clusters=4)
    sig = E.plan_signature(S.semantic_dup_edges(assigned, eps=0.05))
    assert sig.get("FlatMapGroupsInPandas", 0) == 1
    assert sig.get("Exchange", 0) <= 1


def test_semantic_dup_edges_blocked_equals_single_block(spark):
    """The memory-bounding row-blocked GEMM must emit exactly the pairs
    the single-block form does (forced tiny blocks -> many blocks)."""
    items = A.synthetic_clustered_vectors(
        spark, 300, dim=8, n_centers=12, noise=0.02
    )
    assigned = S.cluster_assign(items, k_clusters=12)

    def pairs(block_elems):
        return {
            (r["id_a"], r["id_b"], round(r["cos_dist"], 9))
            for r in S.semantic_dup_edges(
                assigned, eps=0.05, block_elems=block_elems
            ).collect()
        }

    assert pairs(block_elems=64) == pairs(block_elems=1 << 22)


def test_cluster_assign_sampled_fit_still_separates(spark):
    """fit_fraction < 1 fits centroids on a seeded sample; identical
    vectors must still co-cluster (assignment is a full-corpus pass)."""
    items = A.synthetic_clustered_vectors(
        spark, 1000, dim=8, n_centers=8, noise=0.01
    )
    assigned = S.cluster_assign(items, k_clusters=8, fit_fraction=0.3)
    # every true center maps to exactly one k-means cluster
    spread_counts = (
        assigned.groupBy("center")
        .agg(F.countDistinct("cluster_id").alias("k"))
        .collect()
    )
    assert all(r["k"] == 1 for r in spread_counts)


class TestStreamingSemdedup:
    def _dirs(self, tmp_path):
        return (
            str(tmp_path / "store"),
            str(tmp_path / "matches"),
        )

    def test_incremental_matches_planted_dups(self, spark, tmp_path):
        """Batch 2's duplicates of batch-1 vectors must match against the
        STORE (not a corpus recompute); within-batch dups match once with
        the smaller id as matched_id."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            semdedup as SS,
        )

        items = _planted(spark)  # ids 0-11 in 3 dup groups, 12-19 unique
        cents = SS.fit_frozen_centroids(items, k_clusters=6)
        store, matches = self._dirs(tmp_path)

        b1 = items.filter(F.col("vec_id") % 2 == 0)  # even ids first
        b2 = items.filter(F.col("vec_id") % 2 == 1)
        SS.detect_and_register(b1, cents, store, matches, eps=0.05)
        got1 = {
            (r["new_id"], r["matched_id"])
            for r in spark.read.parquet(matches).collect()
        }
        # within batch 1: even members of each group pair up
        assert (2, 0) in got1 and (6, 4) in got1 and (10, 8) in got1
        SS.detect_and_register(b2, cents, store, matches, eps=0.05)
        got = {
            (r["new_id"], r["matched_id"])
            for r in spark.read.parquet(matches).collect()
        }
        # batch-2 odd ids match their even store siblings and each other
        for g in range(3):
            ids = [g * 4 + j for j in range(4)]
            odd = [i for i in ids if i % 2]
            for i in odd:
                assert any(
                    (i, m) in got for m in ids if m != i
                ), (i, got)
        # uniques never match
        assert not any(n >= 12 or m >= 12 for n, m in got)

    def test_stream_wrapper_availablenow(self, spark, tmp_path):
        """End-to-end through readStream/foreachBatch: same matches as
        the direct batch-twin call on the same data."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
            semdedup as SS,
        )

        items = _planted(spark)
        cents = SS.fit_frozen_centroids(items, k_clusters=6)
        indir = str(tmp_path / "in")
        items.write.parquet(indir)
        store, matches = self._dirs(tmp_path)
        q = SS.semdedup_stream(
            spark,
            indir,
            "vec_id long, embedding array<float>, label long",
            cents,
            store,
            matches,
            str(tmp_path / "ckpt"),
            eps=0.05,
        )
        q.awaitTermination(120)
        got = {
            (r["new_id"], r["matched_id"])
            for r in spark.read.parquet(matches).collect()
        }
        store2, matches2 = (
            str(tmp_path / "store2"),
            str(tmp_path / "matches2"),
        )
        SS.detect_and_register(items, cents, store2, matches2, eps=0.05)
        want = {
            (r["new_id"], r["matched_id"])
            for r in spark.read.parquet(matches2).collect()
        }
        assert got == want and len(got) > 0


def test_semantic_dedup_null_embeddings_pass_through(spark):
    """NULL-embedding rows can't be scored: they survive as their own
    keepers (cluster_id NULL) instead of crashing the k-means fit or the
    NumPy kernel."""
    rows = [(i, [float(i % 4 == 0), 1.0, 0.0, 0.0], 0) for i in range(8)]
    rows += [(100, None, 9), (101, None, 9)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )
    out = {
        r["vec_id"]: r
        for r in S.semantic_dedup(df, eps=0.05, k_clusters=2).collect()
    }
    assert len(out) == 10
    for i in (100, 101):
        assert out[i]["is_keeper"] and out[i]["group_id"] == i
        assert out[i]["cluster_id"] is None


def test_streaming_detect_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running the same epoch must
    rewrite its own output, not duplicate matches or store rows."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        semdedup as SS,
    )

    items = _planted(spark)
    cents = SS.fit_frozen_centroids(items, k_clusters=6)
    store, matches = str(tmp_path / "store"), str(tmp_path / "matches")
    b1 = items.filter(F.col("vec_id") % 2 == 0)
    SS.detect_and_register(b1, cents, store, matches, eps=0.05, epoch_id=0)
    once = sorted(
        (r["new_id"], r["matched_id"])
        for r in spark.read.parquet(matches).collect()
    )
    n_store_once = spark.read.parquet(store).count()
    # replay the same epoch (crash-after-write restart)
    SS.detect_and_register(b1, cents, store, matches, eps=0.05, epoch_id=0)
    again = sorted(
        (r["new_id"], r["matched_id"])
        for r in spark.read.parquet(matches).collect()
    )
    assert again == once
    assert spark.read.parquet(store).count() == n_store_once


def test_streaming_detect_drops_null_embeddings(spark, tmp_path):
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        semdedup as SS,
    )

    items = _planted(spark)
    cents = SS.fit_frozen_centroids(items, k_clusters=6)
    with_nulls = items.unionByName(
        spark.createDataFrame(
            [(500, None, 9)], "vec_id long, embedding array<float>, label long"
        )
    )
    store, matches = str(tmp_path / "s"), str(tmp_path / "m")
    SS.detect_and_register(with_nulls, cents, store, matches, eps=0.05)
    stored = spark.read.parquet(store)
    assert stored.filter(F.col("id") == 500).count() == 0
    assert stored.filter(F.col("cluster_id").isNull()).count() == 0


def test_streaming_detect_hot_cluster_raises(spark, tmp_path):
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        semdedup as SS,
    )
    import pytest as _pytest
    from pyspark.errors import PythonException

    items = _planted(spark)
    cents = SS.fit_frozen_centroids(items, k_clusters=2)
    store, matches = str(tmp_path / "s"), str(tmp_path / "m")
    SS.detect_and_register(items, cents, store, matches, eps=0.05)
    with _pytest.raises(PythonException, match="max_store_cluster"):
        SS.detect_and_register(
            items, cents, store, matches, eps=0.05, max_store_cluster=2
        )


def test_semantic_dedup_all_null_embeddings(spark):
    """Every row NULL: the pass-through contract must hold (no k-means
    fit on an empty set)."""
    df = spark.createDataFrame(
        [(1, None, 0), (2, None, 0)],
        "vec_id long, embedding array<float>, label long",
    )
    out = {r["vec_id"]: r for r in S.semantic_dedup(df, k_clusters=2).collect()}
    assert len(out) == 2
    assert all(r["is_keeper"] and r["cluster_id"] is None for r in out.values())


def test_streaming_epoch_counter_reset_refused(spark, tmp_path):
    """A fresh checkpoint pointed at an existing store re-issues low
    epoch ids; overwriting older epochs would destroy accepted state, so
    the batch must be refused loudly."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        semdedup as SS,
    )

    items = _planted(spark)
    cents = SS.fit_frozen_centroids(items, k_clusters=6)
    store, matches = str(tmp_path / "s"), str(tmp_path / "m")
    SS.detect_and_register(
        items.filter(F.col("vec_id") < 10), cents, store, matches,
        eps=0.05, epoch_id=5,
    )
    with pytest.raises(ValueError, match="behind the store"):
        SS.detect_and_register(
            items.filter(F.col("vec_id") >= 10), cents, store, matches,
            eps=0.05, epoch_id=3,
        )


def test_streaming_mixed_layouts_refused(spark, tmp_path):
    """Flat (direct) and epoch-keyed (stream) writes produce incompatible
    store layouts; mixing them against one store must raise, not corrupt
    partition discovery."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        semdedup as SS,
    )

    items = _planted(spark)
    cents = SS.fit_frozen_centroids(items, k_clusters=6)
    store, matches = str(tmp_path / "s"), str(tmp_path / "m")
    b1 = items.filter(F.col("vec_id") < 10)
    b2 = items.filter(F.col("vec_id") >= 10)
    SS.detect_and_register(b1, cents, store, matches, eps=0.05)  # flat
    with pytest.raises(ValueError, match="mixing"):
        SS.detect_and_register(
            b2, cents, store, matches, eps=0.05, epoch_id=0
        )
    store2, matches2 = str(tmp_path / "s2"), str(tmp_path / "m2")
    SS.detect_and_register(
        b1, cents, store2, matches2, eps=0.05, epoch_id=0
    )  # epoch-keyed
    with pytest.raises(ValueError, match="mixing"):
        SS.detect_and_register(b2, cents, store2, matches2, eps=0.05)


def test_boundary_miss_measured_and_topm_mitigation(spark):
    """SemDeDup's cross-cluster blind spot, measured on OVERLAPPING
    clusters (VERDICT r03 #4): the r03 recall test used separable
    clusters where the miss rate is trivially 0.  Here centers are close
    relative to noise, so a material fraction of eps-duplicate pairs
    straddles a k-means boundary: the hard assignment must MISS them
    (bounded below), and the soft top-2 assignment
    (assign_to_centroids_topm) must recover them (bounded above).
    Centroids come from the repo's deterministic NumPy k-means (quant.py)
    so the measured recalls don't drift with Spark session partitioning.
    Calibrated fixture: measured hard recall 0.818, top-2 recall 0.992."""
    import numpy as np

    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators.quant import (
        _kmeans,
    )

    rng = np.random.default_rng(7)
    dim, n_centers, n_base = 16, 16, 300
    centers = rng.normal(size=(n_centers, dim)) * 1.5
    base = centers[rng.integers(0, n_centers, n_base)] + rng.normal(
        scale=1.5, size=(n_base, dim)
    )
    pert = base + rng.normal(scale=0.9, size=base.shape)
    cents = _kmeans(
        np.vstack([base, pert]), n_centers, 20, np.random.default_rng(42)
    ).tolist()
    rows = [(i, base[i].astype(float).tolist()) for i in range(n_base)] + [
        (10_000 + i, pert[i].astype(float).tolist()) for i in range(n_base)
    ]
    items = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()

    eps = 0.3
    exact = {
        (r["left_id"], r["right_id"])
        for r in K.similarity_join(
            items.select(F.col("vec_id").alias("left_id"), "embedding"),
            items.select(F.col("vec_id").alias("right_id"), "embedding"),
            threshold=eps,
            metric="cosine",
        )
        .filter(F.col("left_id") < F.col("right_id"))
        .collect()
    }
    assert len(exact) > 1000  # the fixture is duplicate-dense

    hard = {
        (r["id_a"], r["id_b"])
        for r in S.semantic_dup_edges(
            S.assign_to_centroids(items, cents), eps=eps
        ).collect()
    }
    soft = {
        (r["id_a"], r["id_b"])
        for r in S.semantic_dup_edges(
            S.assign_to_centroids_topm(items, cents, m=2), eps=eps
        )
        .dropDuplicates(["id_a", "id_b"])
        .collect()
    }
    assert hard <= exact and soft <= exact  # never invent pairs
    hard_recall = len(hard & exact) / len(exact)
    soft_recall = len(soft & exact) / len(exact)
    # The blind spot is REAL on overlapping clusters...
    assert hard_recall < 0.9, f"fixture no longer overlaps ({hard_recall})"
    # ...and the top-2 assignment closes most of it.
    assert soft_recall > hard_recall
    assert soft_recall >= 0.97, f"top-2 recall {soft_recall}"


def test_semdedup_stream_inline_compaction(spark, tmp_path):
    """``semdedup_stream(compact_every=2)``: the cluster-partitioned
    vector store folds from inside foreachBatch; matches equal the
    non-compacting twin and the store keeps one row per id."""
    import glob
    import os

    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        semdedup as SS,
    )

    schema = "vec_id long, embedding array<float>"
    cents = [[1.0, 0.0], [0.0, 1.0]]
    files = [
        [(10, [1.0, 0.01]), (11, [0.01, 1.0])],
        [(20, [0.99, 0.02])],
        [(30, [1.0, 0.0])],
        [(40, [0.02, 0.98])],
    ]

    def run(root, compact_every=None):
        src = str(root / "src")
        os.makedirs(src)
        for rows in files:
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        SS.semdedup_stream(
            spark, src, schema, cents, str(root / "store"),
            str(root / "m"), str(root / "ckpt"), eps=0.05,
            max_files_per_trigger=1, compact_every=compact_every,
        ).awaitTermination()
        return sorted(
            (r["new_id"], r["matched_id"])
            for r in spark.read.parquet(str(root / "m")).collect()
        )

    plain_root, comp_root = tmp_path / "plain", tmp_path / "comp"
    os.makedirs(plain_root)
    os.makedirs(comp_root)
    want = run(plain_root)
    got = run(comp_root, compact_every=2)
    assert got == want == sorted(
        [(20, 10), (30, 10), (30, 20), (40, 11)]
    )
    st = spark.read.parquet(str(comp_root / "store"))
    assert st.count() == st.select("id").distinct().count() == 5
    assert len(glob.glob(str(comp_root / "store" / "epoch=*"))) < len(
        glob.glob(str(plain_root / "store" / "epoch=*"))
    )


def test_semdedup_stream_kill_resume_exactly_once(spark, tmp_path):
    """Kill a real semdedup_stream after a batch's state writes but
    before its checkpoint commit, resume from the checkpoint, and assert
    the match log is exactly-once (VERDICT r03 #5 — twin of the
    substring-stream kill/resume test)."""
    import os

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        semdedup as SS,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "vec_id long, embedding array<float>"
    cents = [[1.0, 0.0], [0.0, 1.0]]
    files = [
        [(10, [1.0, 0.01]), (11, [0.01, 1.0])],
        [(20, [0.99, 0.02])],           # matches 10 via the store
        [(30, [1.0, 0.0])],             # matches 10 and 20
        [(40, [0.02, 0.98])],           # matches 11
    ]
    for rows in files:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    store = str(tmp_path / "store")
    matches = str(tmp_path / "matches")
    ckpt = str(tmp_path / "ckpt")

    def crash_on_1(epoch_id: int) -> None:
        if epoch_id == 1:
            raise RuntimeError("injected crash after epoch-1 writes")

    q = SS.semdedup_stream(
        spark, src, schema, cents, store, matches, ckpt, eps=0.05,
        max_files_per_trigger=1, on_batch=crash_on_1,
    )
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination()
    partial = [
        (r["new_id"], r["matched_id"])
        for r in spark.read.parquet(matches).collect()
    ]
    assert (20, 10) in partial and not any(n == 30 for n, _ in partial)

    q = SS.semdedup_stream(
        spark, src, schema, cents, store, matches, ckpt, eps=0.05,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    got = [
        (r["new_id"], r["matched_id"])
        for r in spark.read.parquet(matches).collect()
    ]
    assert len(got) == len(set(got)), "replayed epoch duplicated matches"
    assert set(got) == {(20, 10), (30, 10), (30, 20), (40, 11)}
    # the vector store registered each id exactly once across the crash
    st = spark.read.parquet(store)
    assert st.count() == st.select("id").distinct().count() == 5
