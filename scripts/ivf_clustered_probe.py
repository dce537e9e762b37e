"""IVF recall-vs-speedup curve on CLUSTERED vectors at probe scale.

BASELINE.md's original IVF row measured recall@5 = 0.6 on 1M
uniform-random vectors — the worst case for IVF (no cluster structure to
exploit).  Real embedding corpora are heavily clustered; this probe
(VERDICT r02 #6) measures the nprobe sweep on a 1M-row clustered table
(operators.ann.synthetic_clustered_vectors) next to the exact scan, so
the recall-vs-speedup trade-off is recorded for the regime the index is
actually for.  Run: ``python scripts/ivf_clustered_probe.py [n_vec]``.

Output: one JSON line {n, build_sec, exact_sec, sweep: {nprobe: {recall,
sec, speedup}}} — recalls averaged over several probes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (  # noqa: E402
    get_spark,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (  # noqa: E402
    ann as A,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (  # noqa: E402
    knn as K,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="ivf-clustered-probe")
    results: dict = {"n": n, "dim": 64, "n_centers": 64, "k_clusters": 64}

    vecs = (
        A.synthetic_clustered_vectors(spark, n, dim=64, n_centers=64)
        .drop("center")
        .cache()
    )
    vecs.count()

    t0 = time.time()
    idx = A.IVFIndex(vecs, k_clusters=64)
    idx.indexed.count()
    results["build_sec"] = round(time.time() - t0, 2)

    probes = [
        [float(x) for x in r["embedding"]]
        for r in vecs.filter(F.col("vec_id").isin(1, 7, 11, 23)).collect()
    ]

    exact_sets = []
    t0 = time.time()
    for p in probes:
        exact_sets.append(
            {
                r["vec_id"]
                for r in K.knn(vecs, p, k=5, tie_cols=("vec_id",)).collect()
            }
        )
    results["exact_sec"] = round((time.time() - t0) / len(probes), 2)

    sweep: dict = {}
    for nprobe in (1, 2, 4, 8, 16):
        recalls = []
        t0 = time.time()
        for p, exact in zip(probes, exact_sets):
            got = {
                r["vec_id"]
                for r in idx.search(p, k=5, nprobe=nprobe).collect()
            }
            recalls.append(len(got & exact) / 5.0)
        sec = round((time.time() - t0) / len(probes), 2)
        sweep[nprobe] = {
            "recall": round(sum(recalls) / len(recalls), 2),
            "sec": sec,
            "speedup": round(results["exact_sec"] / sec, 1) if sec else None,
        }
    results["sweep"] = sweep
    print(json.dumps(results))


if __name__ == "__main__":
    main()
