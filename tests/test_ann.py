"""Approximate NN: IVF index and LSH join, with recall asserted against the
exact operators (approximate paths must degrade predictably, not silently)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
    ann as A,
)
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
def ivf(emb):
    return A.IVFIndex(emb, k_clusters=8)


def test_ivf_full_probe_equals_exact(spark, emb, ivf):
    """nprobe = k_clusters searches everything -> must equal exact kNN."""
    probe_vec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    probe = [float(x) for x in probe_vec]
    exact = [
        r["vec_id"]
        for r in K.knn(emb, probe, k=5, tie_cols=("vec_id",)).collect()
    ]
    approx = [
        r["vec_id"] for r in ivf.search(probe, k=5, nprobe=8).collect()
    ]
    assert approx == exact


def test_ivf_recall_reasonable(spark, emb, ivf):
    """nprobe=3 of 8 clusters: average recall@5 over 20 probes >= 0.6
    (random gaussian-ish fixtures are a worst case for IVF; real clustered
    embeddings do far better)."""
    probes = emb.filter(F.col("vec_id") < 20).collect()
    total = hit = 0
    for row in probes:
        probe = [float(x) for x in row["embedding"]]
        exact = {
            r["vec_id"]
            for r in K.knn(emb, probe, k=5, tie_cols=("vec_id",)).collect()
        }
        approx = {
            r["vec_id"] for r in ivf.search(probe, k=5, nprobe=3).collect()
        }
        hit += len(exact & approx)
        total += len(exact)
    assert hit / total >= 0.6


def test_ivf_search_prunes_partitions(spark, emb, ivf):
    """The candidate scan must be smaller than the full table (the whole
    point of the inverted file)."""
    probe = [0.0] * 64
    import numpy as np

    cents = np.array(ivf.centroids)
    clusters = [int(c) for c in np.argsort(np.linalg.norm(cents, axis=1))[:2]]
    cand_count = ivf.indexed.filter(
        F.col("cluster_id").isin(clusters)
    ).count()
    assert 0 < cand_count < emb.count()


def test_lsh_join_subset_of_exact_with_good_recall(spark, emb):
    left = emb.select(F.col("vec_id").alias("left_id"), "embedding")
    right = emb.select(F.col("vec_id").alias("right_id"), "embedding")
    thr = 6.5
    exact = {
        (r["left_id"], r["right_id"])
        for r in K.similarity_join(
            left, right, thr, metric="l2", left_id="left_id", right_id="right_id"
        ).collect()
        if r["left_id"] < r["right_id"]
    }
    approx_rows = A.lsh_similarity_join(
        left, right, thr, num_hash_tables=6, bucket_length=4.0
    ).collect()
    approx = {
        (r["left_id"], r["right_id"])
        for r in approx_rows
        if r["left_id"] < r["right_id"]
    }
    # LSH candidates are verified with the exact distance -> no false pairs
    assert approx <= exact
    # and with 6 hash tables recall should be substantial
    assert len(approx) >= 0.5 * len(exact)
    for r in approx_rows:
        assert r["dist"] < thr


def test_ivf_save_load_roundtrip_with_partition_pruning(spark, emb, ivf, tmp_path):
    """A saved index is parquet partitioned by cluster_id; a loaded index
    returns identical results and its scan prunes unvisited clusters'
    partitions (the point of index-as-data-layout)."""
    import os

    path = str(tmp_path / "ivf")
    ivf.save(path)
    # one directory per cluster
    parts = [d for d in os.listdir(os.path.join(path, "items"))
             if d.startswith("cluster_id=")]
    assert len(parts) >= 2

    loaded = A.IVFIndex.load(spark, path)
    assert loaded.centroids == ivf.centroids
    probe = [float(x) for x in
             emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    a = [(r["vec_id"], round(r["dist"], 4))
         for r in ivf.search(probe, k=5, nprobe=3).collect()]
    b = [(r["vec_id"], round(r["dist"], 4))
         for r in loaded.search(probe, k=5, nprobe=3).collect()]
    assert a == b

    plan = loaded.search(probe, k=5, nprobe=3)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan


def test_embedding_near_dup_lsh_recall_vs_exact(spark):
    """The driver-registered LSH variant of the cosine range join must be a
    subset of the exact pairs (same threshold, exact re-verification) with
    high recall."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (
        queries as Q,
    )

    sf = "/root/testdata/sf0.001"
    exact = {
        (r["left_id"], r["right_id"])
        for r in Q.QUERIES["embedding_near_dup"](spark, sf).collect()
    }
    approx = {
        (r["left_id"], r["right_id"])
        for r in Q.QUERIES["embedding_near_dup_lsh"](spark, sf).collect()
    }
    assert approx <= exact  # exact re-verify: no false positives
    assert exact  # fixture must actually contain near-dup pairs
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall:.2f} ({len(approx)}/{len(exact)})"


def test_ivf_incremental_add_equals_full_build_search(spark, emb):
    """Insert path: build on half the table, add() the rest — a full-probe
    search must equal exact kNN over the WHOLE table (assignment uses the
    frozen centroids, so only recall at small nprobe may differ from a
    fresh build, never correctness at nprobe=k)."""
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    idx = A.IVFIndex(half_a, k_clusters=8)
    idx.add(half_b)
    probe_vec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    probe = [float(x) for x in probe_vec]
    exact = [
        r["vec_id"]
        for r in K.knn(emb, probe, k=5, tie_cols=("vec_id",)).collect()
    ]
    got = [r["vec_id"] for r in idx.search(probe, k=5, nprobe=8).collect()]
    assert got == exact


def test_ivf_assign_matches_kmeans_transform(spark, emb):
    """The native argmin assignment must agree with the fitted k-means
    transform on every row (same geometry, lowest-id tie-break)."""
    idx = A.IVFIndex(emb, k_clusters=8)
    native = idx.assign(emb).select("vec_id", "cluster_id")
    fitted = idx.indexed.select(
        "vec_id", F.col("cluster_id").alias("expected")
    )
    diff = native.join(fitted, "vec_id").filter(
        F.col("cluster_id") != F.col("expected")
    )
    assert diff.count() == 0


def test_ivf_append_to_saved_index_keeps_pruning(spark, emb, tmp_path):
    """append_to() lands new rows inside the existing cluster directories:
    a loaded index sees them, full-probe search covers the union, and the
    probed search still prunes partitions."""
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    idx = A.IVFIndex(half_a, k_clusters=8)
    path = str(tmp_path / "ivf")
    idx.save(path)
    idx.append_to(path, half_b)

    loaded = A.IVFIndex.load(spark, path)
    assert loaded.indexed.count() == emb.count()
    probe_vec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    probe = [float(x) for x in probe_vec]
    exact = [
        r["vec_id"]
        for r in K.knn(emb, probe, k=5, tie_cols=("vec_id",)).collect()
    ]
    got = [
        r["vec_id"] for r in loaded.search(probe, k=5, nprobe=8).collect()
    ]
    assert got == exact
    plan = loaded.search(probe, k=5, nprobe=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan


def test_search_many_matches_per_probe_search(spark, emb):
    """Batch retrieval must return, for every probe, exactly what the
    single-probe search returns at the same nprobe."""
    idx = A.IVFIndex(emb, k_clusters=8)
    probes = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    many = {
        (r["probe_id"], r["rank"]): (r["item_id"], round(r["dist"], 4))
        for r in idx.search_many(probes, k=3, nprobe=2).collect()
    }
    for p in probes.collect():
        single = idx.search([float(x) for x in p["embedding"]], k=3, nprobe=2)
        for rank, r in enumerate(single.collect(), start=1):
            assert many[(p["probe_id"], rank)] == (
                r["vec_id"],
                round(r["dist"], 4),
            )


def test_search_many_probe_cap_fires(spark, emb, ivf):
    # VERDICT r02 #2: search_many collects the probe side — enforce the
    # "small by contract" claim instead of OOMing the driver.
    probes = emb.select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    with pytest.raises(ValueError, match="max_rows"):
        ivf.search_many(probes, k=3, max_probe_rows=10)


def test_ivf_recall_on_clustered_data(spark):
    """VERDICT r02 #6: the >=0.8 recall bound must hold off the toy
    fixture.  Uniform-random vectors are IVF's worst case; clustered data
    (what embedding corpora actually look like) is the design target —
    recall there must clear 0.8 with a small nprobe."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
        knn as K,
    )

    vecs = A.synthetic_clustered_vectors(
        spark, 20_000, dim=32, n_centers=16, noise=0.05
    ).cache()
    vecs.count()
    idx = A.IVFIndex(vecs.drop("center"), k_clusters=16)
    recalls = {}
    for probe_row in vecs.filter(F.col("vec_id").isin(1, 7, 11)).collect():
        probe = [float(x) for x in probe_row["embedding"]]
        exact = {
            r["vec_id"]
            for r in K.knn(
                vecs.drop("center"), probe, k=5, tie_cols=("vec_id",)
            ).collect()
        }
        for nprobe in (1, 4):
            approx = {
                r["vec_id"]
                for r in idx.search(probe, k=5, nprobe=nprobe).collect()
            }
            recalls.setdefault(nprobe, []).append(len(exact & approx) / 5.0)
    vecs.unpersist()
    # nprobe=4 must clear the documented bound on clustered data; nprobe=1
    # is reported but unasserted (k-means may split a true center).
    mean4 = sum(recalls[4]) / len(recalls[4])
    assert mean4 >= 0.8, f"clustered recall@5 nprobe=4 = {recalls}"


def test_ivf_canonical_fit_is_deterministic_and_searchable(spark):
    """fit_impl="canonical": two builds over the same corpus produce
    byte-identical centroids (the ml path's distributed aggregation order
    does not guarantee this — BASELINE.md records the measured IVFPQ
    recall spread), and search still clears the clustered-recall bound."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
        knn as K,
    )

    vecs = A.synthetic_clustered_vectors(
        spark, 10_000, dim=32, n_centers=16, noise=0.05
    ).drop("center").cache()
    vecs.count()
    a = A.IVFIndex(vecs, k_clusters=16, fit_impl="canonical")
    b = A.IVFIndex(vecs, k_clusters=16, fit_impl="canonical")
    assert np.array_equal(np.asarray(a.centroids), np.asarray(b.centroids))
    # sampled canonical fit is deterministic too — BOTH sampling stages:
    # fit_fraction exercises the stage that silently dropped its seed
    # when called as sample(frac, seed=...) (positional-float fraction
    # ignores the seed kwarg — found when canonical probe builds failed
    # to reproduce), sample_rows the second-stage cap.
    c = A.IVFIndex(
        vecs, k_clusters=16, fit_impl="canonical", fit_fraction=0.6,
        sample_rows=2_000,
    )
    d = A.IVFIndex(
        vecs, k_clusters=16, fit_impl="canonical", fit_fraction=0.6,
        sample_rows=2_000,
    )
    assert np.array_equal(np.asarray(c.centroids), np.asarray(d.centroids))

    probe_row = vecs.filter(F.col("vec_id") == 7).collect()[0]
    probe = [float(x) for x in probe_row["embedding"]]
    exact = {
        r["vec_id"]
        for r in K.knn(vecs, probe, k=5, tie_cols=("vec_id",)).collect()
    }
    approx = {r["vec_id"] for r in a.search(probe, k=5, nprobe=4).collect()}
    assert len(exact & approx) / 5.0 >= 0.8
    vecs.unpersist()
    with pytest.raises(ValueError, match="fit_impl"):
        A.IVFIndex(vecs, k_clusters=4, fit_impl="bogus")


def test_ivfpq_canonical_coarse_build_reproduces_exactly(spark):
    """coarse_fit_impl="canonical" + the canonical PQ fits: rebuilding the
    IVFPQ index over the same corpus reproduces centroids, codebooks, and
    search results byte-for-byte."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
        quant as Qz,
    )

    vecs = A.synthetic_clustered_vectors(
        spark, 6_000, dim=32, n_centers=8, noise=0.05
    ).drop("center").cache()
    vecs.count()

    def build():
        return Qz.IVFPQIndex(
            vecs, k_clusters=8, m=4, codes=16, iters=5,
            coarse_fit_impl="canonical",
        )

    i1, i2 = build(), build()
    assert np.array_equal(i1.centroids, i2.centroids)
    assert np.array_equal(i1.pq.books, i2.pq.books)
    probe = [float(x) for x in vecs.filter("vec_id = 3").collect()[0]["embedding"]]
    r1 = [(r["vec_id"],) for r in i1.search(probe, k=5, nprobe=2).collect()]
    r2 = [(r["vec_id"],) for r in i2.search(probe, k=5, nprobe=2).collect()]
    assert r1 == r2
    vecs.unpersist()


def test_nearest_centroid_gemm_path_matches_literal_path(spark):
    """nearest_centroid_col dispatches to an Arrow-batched GEMM above
    ~16k inlined centroid values (the literal expression tree splinters
    codegen at the reference's 1536-d — BASELINE.md r06).  Both paths
    must agree row-for-row; the probe threshold is forced by a 2048-d
    fixture so the GEMM branch is actually exercised (the original
    implementation shipped a pandas-UDF signature bug precisely because
    no fixture crossed the threshold)."""
    vecs = A.synthetic_clustered_vectors(
        spark, 500, dim=2048, n_centers=10, parts=4
    ).drop("center")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in vecs.filter(F.col("vec_id") < 10).collect()
    ]
    assert len(cents) * len(cents[0]) > 16_384  # GEMM branch engaged
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in vecs.withColumn(
            "cluster_id", A.nearest_centroid_col(cents, "embedding")
        ).collect()
    }
    # reference: plain numpy argmin over exact squared L2
    C = np.asarray(cents)
    for r in vecs.collect():
        x = np.asarray(r["embedding"], dtype=np.float64)
        want = int(((x[None, :] - C) ** 2).sum(1).argmin())
        assert got[r["vec_id"]] == want, r["vec_id"]


def test_nearest_centroid_both_paths_null_to_null(spark):
    """Malformed input contract (ADVICE r6): null and wrong-dimension
    vectors map to null cluster_id in BOTH dispatch branches — the GEMM
    branch originally raised on None (np.asarray) and returned an empty
    Series for ragged batches (a confusing UDF length-mismatch error),
    diverging from the literal branch's null->null semantics."""
    rows = [
        (1, [1.0, 0.0]), (2, None), (3, [0.0]), (4, [0.0, 1.0, 2.0]),
        (5, [0.0, 1.0]),
    ]
    small = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    lit_cents = [[1.0, 0.0], [0.0, 1.0]]
    want_small = {1: 0, 2: None, 3: None, 4: None, 5: 1}
    got_lit = {
        r["vec_id"]: r["c"]
        for r in small.withColumn(
            "c", A.nearest_centroid_col(lit_cents, "embedding")
        ).collect()
    }
    assert got_lit == want_small

    # GEMM branch: same fixture padded to a dim that crosses the 16k
    # dispatch threshold (9 centroids x 2048 dims).
    dim = 2048
    big_rows = [
        (i, ([float(i)] * dim if ok else ([0.0] * 3 if i == 4 else None)))
        for i, ok in [(1, True), (2, False), (4, False), (5, True)]
    ]
    big = spark.createDataFrame(
        big_rows, "vec_id long, embedding array<double>"
    )
    big_cents = [[float(c)] * dim for c in range(9)]
    assert len(big_cents) * dim > 16_384
    got_gemm = {
        r["vec_id"]: r["c"]
        for r in big.withColumn(
            "c", A.nearest_centroid_col(big_cents, "embedding")
        ).collect()
    }
    assert got_gemm == {1: 1, 2: None, 4: None, 5: 5}
    # all-null batch must not crash either
    allnull = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<double>"
    )
    assert [
        r["c"] for r in allnull.withColumn(
            "c", A.nearest_centroid_col(big_cents, "embedding")
        ).collect()
    ] == [None, None]


def test_recall_report_tier_floors_are_pinned(spark):
    """Hard per-tier recall floors for the driver-visible
    ``ann_recall_report`` (VERDICT r06 next-round #6): a recall drift in
    any quantization/pruning tier fails CI instead of waiting for a
    human to read BASELINE.md between rounds (that is how r5's
    pq_refine 0.96 -> 0.95 drift was caught).  The report is
    deterministic per fixture (seeded k-means), so these are regression
    pins with measured margin, not statistical claims: measured means at
    sf0.001 / sf0.01 are sq8 1.0/1.0, sq8_1536d 1.0/1.0, pq_refine
    0.9188/0.9188 (shortlist 50), ivf 0.694/0.663 (nprobe 2 of 8),
    ivfpq 0.681/0.650 (nprobe 2, shortlist 50), pq 0.431/0.525 (raw ADC,
    the by-design weak tier).  Floors hold at BOTH fixtures; any seeded-
    kernel change must re-validate them with a seed sweep
    (BASELINE.md discipline)."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (
        queries as Q,
    )

    report = Q.QUERIES["ann_recall_report"](spark, "/root/testdata/sf0.001")
    means = {
        r["method"]: r["recall_at_5"]
        for r in report.filter("probe_id = -1").collect()
    }
    floors = {
        "sq8": 0.99,
        "sq8_1536d": 0.99,
        "pq_refine": 0.90,
        "ivf": 0.60,
        "ivfpq": 0.60,
        "pq": 0.40,
    }
    assert set(means) == set(floors), f"tiers changed: {sorted(means)}"
    bad = {m: v for m, v in means.items() if v < floors[m]}
    assert not bad, f"recall floor violations (floor -> got): " + ", ".join(
        f"{m}: {floors[m]} -> {v:.4f}" for m, v in bad.items()
    )


def test_projection_lsh_join_semantics(spark):
    """projection_lsh_join (the embedding_lsh_fixed_planes oracle row's
    operator): planted close pairs that share a bucket are found with
    exact distances, every emitted pair passes the verify (< threshold —
    precision 1.0 by construction), the output is a subset of the exact
    similarity join, and the anti-reflexive self-join emits each
    unordered pair once."""
    import numpy as np

    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
        ann as A,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (
        knn as K,
    )

    rng = np.random.default_rng(3)
    rows = []
    vid = 0
    for g in range(5):  # 5 planted pairs of near-identical vectors
        base = rng.normal(size=8)
        for j in range(2):
            v = base + 0.001 * j
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(20):  # spread-out singles
        rows.append(
            (vid, [float(x) for x in rng.normal(size=8) * 5.0])
        )
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planes = [
        [((t * 37 + i * 13) % 19 - 9) / 9.0 for i in range(8)]
        for t in range(4)
    ]
    out = A.projection_lsh_join(
        df.selectExpr("vec_id AS left_id", "embedding"),
        df.selectExpr("vec_id AS right_id", "embedding"),
        planes,
        bucket_length=1.0,
        threshold=0.5,
        anti_reflexive=True,
    ).collect()
    got = {(r["left_id"], r["right_id"]): r["dist"] for r in out}
    # planted pairs are ~0.003 apart: identical buckets in every table
    for g in range(5):
        assert (2 * g, 2 * g + 1) in got
    exact = {
        (r["left_id"], r["right_id"]): r["dist"]
        for r in K.similarity_join(
            df.selectExpr("vec_id AS left_id", "embedding"),
            df.selectExpr("vec_id AS right_id", "embedding"),
            threshold=0.5,
        ).collect()
        if r["left_id"] < r["right_id"]
    }
    assert set(got) <= set(exact)
    for k, v in got.items():
        assert v < 0.5
        assert exact[k] == pytest.approx(v)
