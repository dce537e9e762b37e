"""r12 stage-level timing of the bench ivfpq_search composition (guide
§1.2: isolate the expensive query; time stages with the noop sink /
forced materialization so we know which stage to attack).

Usage: python scripts/r12_ivfpq_stage_probe.py [sf_dir] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (  # noqa: E402,E501
    get_spark,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (  # noqa: E402,E501
    quant as Qz,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.tables import (  # noqa: E402,E501
    load_table,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    spark.sparkContext.setJobDescription("r12 ivfpq stage probe")

    for rep in range(reps):
        emb = load_table(spark, sf_dir, "embeddings")
        probes = emb.filter(F.col("vec_id") < 32).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        walls = {}
        t0 = time.time()
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators.ann import (  # noqa: E501
            IVFIndex,
        )

        base = IVFIndex(
            emb, k_clusters=8, id_col="vec_id", vec_col="embedding",
            seed=42, fit_fraction=1.0, max_iter=20, fit_impl="ml",
            sample_rows=100_000,
        )
        walls["coarse_fit+layout"] = time.time() - t0

        t0 = time.time()
        base.indexed.count()
        walls["base_materialize"] = time.time() - t0

        idx = Qz.IVFPQIndex.__new__(Qz.IVFPQIndex)
        idx.id_col, idx.vec_col = "vec_id", "embedding"
        idx.base = base
        import numpy as np

        idx.centroids = np.asarray(base.centroids, dtype=np.float64)
        t0 = time.time()
        resid = idx._residuals(base.indexed)
        n = base.indexed.count()
        sample = resid.select(F.col("__resid").alias("embedding"))
        if n > 100_000:
            sample = sample.sample(False, 100_000 / n * 0.9, seed=42)
        idx.pq = Qz.PQCodebook(
            sample, m=8, codes=64, sample_rows=100_000, iters=10, seed=42,
            fit_mode="auto",
        )
        walls["pq_fit"] = time.time() - t0

        t0 = time.time()
        idx.indexed = (
            idx._residual_codes(resid).repartition("cluster_id").cache()
        )
        idx.indexed.count()
        walls["code_table"] = time.time() - t0

        t0 = time.time()
        shortlist = idx.search_many(probes, shortlist=50, nprobe=2)
        out = Qz.PQCodebook.refine(shortlist, emb, probes, k=5)
        out.write.format("noop").mode("overwrite").save()
        walls["search+refine"] = time.time() - t0

        total = sum(walls.values())
        print(
            f"rep{rep}: total={total:.2f}s "
            + " ".join(f"{k}={v:.2f}" for k, v in walls.items()),
            flush=True,
        )
        idx.indexed.unpersist()
        base.indexed.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
