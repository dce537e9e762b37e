"""Store-scan vs keyed-state substring-dedup probe (r04).

Seeds each incremental form with ``n_seed`` accepted docs, then times one
``n_batch``-doc arrival batch.  The parquet-store form's batch cost is
linear in corpus-wide distinct grams (it scans the store); the
keyed-state form's is linear in BATCH grams (checkpointed state lookups)
plus a per-group Python overhead — this probe records both so the
crossover is measured, not asserted.

Run: ``python scripts/substring_stream_probe.py [n_seed] [n_batch]``.
Output: one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (  # noqa: E402
    get_spark,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (  # noqa: E402
    substring as SB,
)
from scripts.semdedup_probe import boilerplate_docs  # noqa: E402


def main() -> None:
    n_seed = int(sys.argv[1]) if len(sys.argv) > 1 else 900_000
    n_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark(app_name="substring-stream-probe")
    results: dict = {"n_seed": n_seed, "n_batch": n_batch}

    all_docs = boilerplate_docs(spark, n_seed + n_batch).cache()
    all_docs.count()
    seed = all_docs.filter(f"doc_id < {n_seed}")
    batch = all_docs.filter(f"doc_id >= {n_seed}")

    tmp = tempfile.mkdtemp(prefix="substr_probe_")
    try:
        # --- parquet-store form -----------------------------------------
        gram_d, s_d = f"{tmp}/grams", f"{tmp}/stats"
        t0 = time.time()
        SB.detect_and_register(seed, gram_d, s_d, n=8, epoch_id=0)
        results["store_seed_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        SB.detect_and_register(batch, gram_d, s_d, n=8, epoch_id=1)
        results["store_batch_sec"] = round(time.time() - t0, 2)

        # --- keyed-state form -------------------------------------------
        src1, src2 = f"{tmp}/src", f"{tmp}/src2"
        ks_d, ckpt = f"{tmp}/kstats", f"{tmp}/kckpt"
        seed.write.parquet(src1)
        t0 = time.time()
        q = SB.keyed_substring_stream(
            spark, src1, "doc_id long, text string", ks_d, ckpt, n=8
        )
        q.awaitTermination()
        results["keyed_seed_sec"] = round(time.time() - t0, 2)
        batch.write.mode("append").parquet(src1)
        t0 = time.time()
        q = SB.keyed_substring_stream(
            spark, src1, "doc_id long, text string", ks_d, ckpt, n=8
        )
        q.awaitTermination()
        results["keyed_batch_sec"] = round(time.time() - t0, 2)

        # correctness cross-check: both forms flag the same planted docs
        sf = spark.read.parquet(s_d)
        kf = spark.read.parquet(ks_d)
        results["store_flagged"] = sf.filter("n_dup_grams > 0").count()
        results["keyed_flagged"] = kf.filter("n_dup_grams > 0").count()
        del src2
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
