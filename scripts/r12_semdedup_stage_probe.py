"""Round-12 stage-level wall breakdown of semantic_dedup_fixed_centroids
at sf0.1 (guide §1 measure-first): times the assignment, the within-
cluster GEMM edge pass, star-contraction components, and the composed
query, each to a noop sink, so the composed ~4 s is attributed before
anything is touched.

Usage: python scripts/r12_semdedup_stage_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (  # noqa: E402
    get_spark,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (  # noqa: E402
    dedup as D,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (  # noqa: E402
    semdedup as SD,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.queries.selection import (  # noqa: E402
    semantic_dedup_fixed_centroids,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.tables import (  # noqa: E402
    load_table,
)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="r12_semdedup_stage_probe")
    sc = spark.sparkContext

    dim, n_clusters = 64, 8
    cents = [
        [((c * 29 + i * 11) % 23 - 11) / 11.0 for i in range(dim)]
        for c in range(n_clusters)
    ]

    for rep in range(reps):
        print(f"=== rep {rep} (loadavg {os.getloadavg()}) ===", flush=True)
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        valid = emb.filter(F.col("embedding").isNotNull())

        t0 = time.time()
        assigned = SD.assign_to_centroids(valid, cents, vec_col="embedding")
        sc.setJobDescription("probe: assigned")
        noop(assigned)
        t1 = time.time()
        print(f"  1_assigned_noop: {t1 - t0:.2f}s", flush=True)

        edges = SD.semantic_dup_edges(
            assigned, eps=0.6, id_col="vec_id", vec_col="embedding"
        )
        sc.setJobDescription("probe: edges")
        noop(edges)
        t2 = time.time()
        print(f"  2_edges_noop (incl re-assign): {t2 - t1:.2f}s", flush=True)

        comps = D.connected_components_star(edges, "id_a", "id_b")
        sc.setJobDescription("probe: comps")
        noop(comps)
        t3 = time.time()
        print(f"  3_comps_noop (incl re-edges): {t3 - t2:.2f}s", flush=True)

        sc.setJobDescription("probe: composed query")
        noop(semantic_dedup_fixed_centroids(spark, sf_dir))
        t4 = time.time()
        print(f"  4_composed_query: {t4 - t3:.2f}s", flush=True)
        sc.setJobDescription(None)


if __name__ == "__main__":
    main()
