"""Round-12 stage-level wall breakdown of curation_v2_pipeline at sf0.1.

Replicates curate_corpus_v2(min_stops=0) stage by stage with explicit
materialization points, timing each — the measure-first step (guide §1)
that names where the composed 15 s actually goes before touching anything.

Usage: python scripts/r12_curation_stage_probe.py [sf_dir] [reps]
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
    selection as SEL,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (  # noqa: E402
    textstats as TS,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.tables import (  # noqa: E402
    load_table,
)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="r12-curation-stage-probe")
    spark.range(1000).selectExpr("sum(id)").collect()

    for rep in range(reps):
        print(f"=== rep {rep} (loadavg {os.getloadavg()}) ===")
        docs = load_table(spark, sf_dir, "documents")
        t = {}

        t0 = time.time()
        gate = D.curation_v2_gate(docs, min_stops=0)
        noop(gate)
        t["1_gate_noop"] = time.time() - t0

        # tercile construction (the driver-side folds inside)
        t0 = time.time()
        terc = TS.surprisal_tercile_buckets(gate, "text", "id")
        t["2_tercile_construct(actions)"] = time.time() - t0

        t0 = time.time()
        gated2 = gate.join(
            terc.filter(F.col("bucket") != F.lit("tail")), "id"
        ).localCheckpoint(eager=True)
        t["3_gated2_checkpoint"] = time.time() - t0

        t0 = time.time()
        kept = D.curation_v2_kept(gated2, False, 8, 2)
        noop(kept)
        t["4_kept_noop"] = time.time() - t0

        t0 = time.time()
        pairs = D.jaccard_pairs(
            kept, "text", "id", n=3, threshold=0.8, max_df=5
        )
        noop(pairs)
        t["5_pairs_noop"] = time.time() - t0

        t0 = time.time()
        assign = D.leakage_safe_split(kept, "text", "id", pairs=pairs)
        csize = assign.groupBy("cluster_rep").agg(
            F.count("*").cast("long").alias("near_dups")
        )
        surv = (
            kept.join(assign, "id")
            .filter(F.col("id") == F.col("cluster_rep"))
            .join(csize, "cluster_rep")
            .localCheckpoint(eager=True)
        )
        t["6_surv_checkpoint"] = time.time() - t0

        t0 = time.time()
        sel = SEL.dsir_select(
            surv.select("id", "lang", "text"),
            F.col("lang") == F.lit("en"),
            k=100,
            m=1024,
            text_col="text",
            id_col="id",
            bigrams=True,
        )
        t["7_dsir_construct(actions)"] = time.time() - t0

        t0 = time.time()
        out = surv.join(sel, "id").select(
            F.col("id").alias("doc_id"), "lang", "n_words",
            "bits_per_token_ppm", "bucket", "exact_dups", "stripped_tokens",
            "near_dups", "split", "n_feats", "score_bits", "mean_milli",
            "selected",
        ).orderBy("doc_id")
        noop(out)
        t["8_final_noop"] = time.time() - t0

        total = sum(t.values())
        for k, v in t.items():
            print(f"  {k}: {v:.2f}s")
        print(f"  TOTAL staged-eager: {total:.2f}s")

        # the real composed call for comparison
        t0 = time.time()
        noop(D.curate_corpus_v2(docs, min_stops=0).orderBy("doc_id"))
        print(f"  composed curate_corpus_v2: {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
