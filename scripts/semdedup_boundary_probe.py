"""SemDeDup boundary-miss probe on OVERLAPPING clusters (VERDICT r03 #4).

The separable-cluster recall test shows recall 1.0 because no duplicate
pair straddles a k-means boundary there.  This probe measures the miss on
a fixture built to overlap — centers at scale comparable to noise, planted
near-duplicate partners at cosine distance inside eps — and the recovery
bought by the soft top-2 assignment (assign_to_centroids_topm), at a scale
where the exact ground truth is still computable (blocked-GEMM range
join).

Run: ``python scripts/semdedup_boundary_probe.py [n_base] [eps]``.
Output: one JSON line {exact_pairs, hard_recall, top2_recall, timings}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (  # noqa: E402
    get_spark,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (  # noqa: E402
    knn as K,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (  # noqa: E402
    semdedup as S,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators.quant import (  # noqa: E402
    _kmeans,
)


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    eps = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
    dim, n_centers = 16, 64
    spark = get_spark(app_name="semdedup-boundary-probe")
    results: dict = {
        "n_base": n_base, "eps": eps, "dim": dim, "k": n_centers,
    }

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(n_centers, dim)) * 1.5
    base = centers[rng.integers(0, n_centers, n_base)] + rng.normal(
        scale=1.5, size=(n_base, dim)
    )
    pert = base + rng.normal(scale=0.9, size=base.shape)
    pdf = pd.DataFrame(
        {
            "vec_id": np.concatenate(
                [np.arange(n_base), np.arange(n_base) + 10_000_000]
            ),
            "embedding": list(np.vstack([base, pert]).astype(float)),
        }
    )
    items = spark.createDataFrame(pdf).cache()
    n_all = items.count()

    t0 = time.time()
    exact = (
        K.similarity_join(
            items.select(F.col("vec_id").alias("left_id"), "embedding"),
            items.select(F.col("vec_id").alias("right_id"), "embedding"),
            threshold=eps,
            metric="cosine",
            sizes=(n_all, n_all),
        )
        .filter(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
        .cache()
    )
    results["exact_pairs"] = exact.count()
    results["exact_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    cents = _kmeans(
        np.vstack([base, pert]), n_centers, 20, np.random.default_rng(42)
    ).tolist()
    results["fit_sec"] = round(time.time() - t0, 2)

    def recall(assigned, label):
        t0 = time.time()
        got = (
            S.semantic_dup_edges(
                assigned, eps=eps, max_cluster_size=n_all
            )
            .dropDuplicates(["id_a", "id_b"])
            .select(
                F.col("id_a").alias("left_id"), F.col("id_b").alias("right_id")
            )
        )
        hit = exact.join(got, ["left_id", "right_id"], "left_semi").count()
        results[f"{label}_recall"] = round(hit / results["exact_pairs"], 4)
        results[f"{label}_sec"] = round(time.time() - t0, 2)

    recall(S.assign_to_centroids(items, cents), "hard")
    recall(S.assign_to_centroids_topm(items, cents, m=2), "top2")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
