"""Quantization probe at 1M vectors: compression, scan speed, recall.

Measures the SQ8 and PQ paths (operators/quant.py) against the exact
float scan on a 1M x 64-d clustered table — the regime the compression
tiers exist for: does the 4x (SQ8) / 32x (PQ) smaller representation
actually buy scan speed, and what recall does each tier keep?  Run:
``python scripts/quant_probe.py [n_vec]``.

Output: one JSON line {n, fit/encode timings, bytes per vector, per-tier
{sec, recall}} — recalls averaged over several probes, distances L2.
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
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (  # noqa: E402
    quant as Qz,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    # dim as argv[2]: 64 is the fixture shape; 1536 is the reference's
    # real embedding dimensionality (text-embedding-ada-002, README) —
    # the r04 BASELINE row runs `quant_probe.py 200000 1536`.
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    # --canonical: deterministic coarse fit (IVFIndex fit_impl=
    # "canonical") so back-to-back probe runs reproduce the IVFPQ recall
    # tiers exactly (BASELINE.md r06 — the default ml.KMeans coarse fit's
    # aggregation order varies per run).
    canonical = "--canonical" in sys.argv
    # PQ subquantizers must divide dim; keep 8 dims/subspace at 64-d
    # (m=8) and the standard 16 dims/subspace at high dim (1536 -> m=96).
    m_pq = 8 if dim <= 128 else dim // 16
    spark = get_spark(app_name="quant-probe")
    results: dict = {"n": n, "dim": dim, "m_pq": m_pq, "coarse_fit": "canonical" if canonical else "ml"}

    vecs = (
        A.synthetic_clustered_vectors(spark, n, dim=dim, n_centers=64)
        .drop("center")
        .cache()
    )
    vecs.count()

    probe_rows = vecs.filter(F.col("vec_id").isin(1, 7, 11, 23)).collect()
    probes = [[float(x) for x in r["embedding"]] for r in probe_rows]
    probes_df = (
        vecs.filter(F.col("vec_id").isin(1, 7, 11, 23))
        .select(F.col("vec_id").alias("probe_id"), "embedding")
        .cache()
    )
    probes_df.count()

    exact_sets = []
    t0 = time.time()
    for p in probes:
        exact_sets.append(
            {
                r["vec_id"]
                for r in K.knn(vecs, p, k=5, tie_cols=("vec_id",)).collect()
            }
        )
    results["exact_scan_sec"] = round((time.time() - t0) / len(probes), 2)

    # ---- SQ8 -------------------------------------------------------------
    t0 = time.time()
    sq8 = Qz.SQ8(vecs, dim=dim)
    results["sq8_fit_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    enc8 = sq8.encode(vecs).select("vec_id", "code").cache()
    enc8.count()
    results["sq8_encode_sec"] = round(time.time() - t0, 2)
    results["sq8_bytes_per_vec"] = dim  # tinyint per dim vs 4*dim fp32
    recalls, t0 = [], time.time()
    for p, exact in zip(probes, exact_sets):
        got = {r["vec_id"] for r in sq8.knn(enc8, p, k=5).collect()}
        recalls.append(len(got & exact) / 5.0)
    results["sq8_scan_sec"] = round((time.time() - t0) / len(probes), 2)
    results["sq8_recall_at_5"] = round(sum(recalls) / len(recalls), 2)

    # ---- PQ --------------------------------------------------------------
    t0 = time.time()
    pq = Qz.PQCodebook(
        vecs.filter(F.col("vec_id") % 97 == 0), m=m_pq, codes=256, iters=10
    )
    results["pq_fit_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    encp = pq.encode(vecs).cache()
    encp.count()
    results["pq_encode_sec"] = round(time.time() - t0, 2)
    results["pq_bytes_per_vec"] = pq.m

    # Shortlist sweep: on heavily-clustered data every same-cluster point
    # has a near-identical code, so the shortlist must grow with the
    # cluster population for the refine step to see the true top-5 —
    # record the recall-vs-shortlist curve rather than one operating point.
    for shortlist_k in (50, 500, 2000):
        t0 = time.time()
        shortlist = pq.search_many(encp, probes_df, k=shortlist_k).cache()
        shortlist.count()
        adc_sec = round((time.time() - t0) / len(probes), 2)
        refined = Qz.PQCodebook.refine(
            shortlist, vecs, probes_df, k=5
        ).collect()
        shortlist.unpersist()
        by_probe: dict = {}
        for r in refined:
            by_probe.setdefault(r["probe_id"], set()).add(r["vec_id"])
        recalls = [
            len(by_probe.get(pr["vec_id"], set()) & exact) / 5.0
            for pr, exact in zip(probe_rows, exact_sets)
        ]
        results[f"pq_shortlist{shortlist_k}"] = {
            "adc_batch_sec": adc_sec,
            "refined_recall_at_5": round(sum(recalls) / len(recalls), 2),
        }

    # ---- IVF + PQ on residuals (the 100 TB composition) ------------------
    t0 = time.time()
    # high-dim: sample the coarse fit (the full-corpus pyspark.ml fit
    # dominated the 1536-d build at ~17 min; the sampled fit is the
    # corpus-scale shape and recall is re-measured below either way)
    ivfpq = Qz.IVFPQIndex(
        vecs, k_clusters=64, m=m_pq, codes=256, iters=10,
        fit_fraction=1.0 if dim <= 128 else 0.1,
        coarse_max_iter=20 if dim <= 128 else 10,
        coarse_fit_impl="canonical" if canonical else "ml",
    )
    ivfpq.indexed.count()
    results["ivfpq_build_sec"] = round(time.time() - t0, 2)
    for shortlist_k in (50, 200, 800):
        recalls, t0 = [], time.time()
        for p, exact in zip(probes, exact_sets):
            got = {
                r["vec_id"]
                for r in ivfpq.search(
                    p, k=5, nprobe=4, shortlist=shortlist_k, refine_items=vecs
                ).collect()
            }
            recalls.append(len(got & exact) / 5.0)
        results[f"ivfpq_shortlist{shortlist_k}"] = {
            "search_sec": round((time.time() - t0) / len(probes), 2),
            "refined_recall_at_5": round(sum(recalls) / len(recalls), 2),
        }

    print(json.dumps(results))


if __name__ == "__main__":
    main()
