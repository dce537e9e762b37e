"""Scale probes for the round-3 dedup additions (BASELINE.md evidence):

1. **SemDeDup at 1M vectors** (operators/semdedup.py): 100k planted
   exact-duplicate pairs hidden in 1M 64-d vectors.  Measures the k-means
   fit, the within-cluster blocked-GEMM edge scan (the O(sum c_i^2) cost
   the paper trades against O(n^2)), and the component/keeper pass —
   and checks the planted pairs are all recovered (identical vectors
   always co-cluster, so exact-dup recall is 1.0 by construction; the
   near-dup recall trade-off is measured separately in
   tests/test_semdedup.py on separable clusters).

2. **ngram_dup_stats at 1M docs** (operators/dedup.py): 10% of docs carry
   a shared 10-word boilerplate prefix; every such doc must be flagged
   with >= 3 duplicated 8-gram windows.  Measures the two-hash-shuffle
   substring-dedup pass (~23M gram occurrences).

3. **strip_dup_ngrams at 1M docs**: the removal half — exactly the
   planted boilerplate tokens must be cut.

4. **Sampled k-means fit** (``cluster_assign(fit_fraction=0.1)``) vs the
   full fit at 1M vectors, asserting no planted duplicate pair is split
   across clusters by the sampled quantizer.

5. **Streaming incremental batch** (streaming/semdedup.py): a 10k-vector
   batch against a 900k-row frozen-centroid store — the per-batch cost
   of the ingest-time SemDeDup question through the bipartite GEMM.

6. **Streaming substring ingest** (streaming/substring.py): a 100k-doc
   batch against a gram store accumulated from 900k accepted docs.

Run: ``python scripts/semdedup_probe.py [n_vec] [n_docs]``.
Output: one JSON line per probe.
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
    dedup as D,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (  # noqa: E402
    semdedup as S,
)


def dup_vectors(spark, n: int, dim: int = 64, parts: int = 64):
    """1M vectors where ids >= 0.9n repeat the vector of id - 0.9n:
    n/10 planted exact-duplicate pairs, everything else hash-unique."""
    content = F.pmod(F.col("id"), F.lit(int(n * 0.9)))

    def elem(j):
        return (
            (F.pmod(F.hash(content, F.lit(j)), F.lit(2001)) - F.lit(1000))
            / F.lit(1000.0)
        ).cast("float")

    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(dim)), elem).alias("embedding"),
    )


def boilerplate_docs(spark, n: int, parts: int = 64):
    """~30-word docs; every 10th doc starts with the same 10-word
    boilerplate prefix (the substring-dedup target)."""
    prefix = " ".join(f"boiler{j}" for j in range(10))
    body = F.concat_ws(
        " ",
        *[
            F.concat(F.lit("w"), F.hash(F.col("id"), F.lit(j)))
            for j in range(20)
        ],
    )
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 10 == 0, F.concat(F.lit(prefix + " "), body)
        )
        .otherwise(body)
        .alias("text"),
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_vec = int(args[0]) if args else 1_000_000
    n_docs = int(args[1]) if len(args) > 1 else 1_000_000
    spark = get_spark(app_name="semdedup-probe")

    # --- probe 1: SemDeDup ------------------------------------------------
    vecs = dup_vectors(spark, n_vec).cache()
    vecs.count()
    planted_pairs = n_vec // 10

    t0 = time.time()
    assigned = S.cluster_assign(
        vecs, k_clusters=64, max_iter=5
    ).localCheckpoint()
    fit_sec = round(time.time() - t0, 2)

    t0 = time.time()
    edges = S.semantic_dup_edges(
        assigned, eps=0.05, max_cluster_size=n_vec
    )
    n_edges = edges.count()
    edges_sec = round(time.time() - t0, 2)

    t0 = time.time()
    out = S.semantic_dedup(vecs, eps=0.05, k_clusters=64, max_cluster_size=n_vec)
    n_dropped = out.filter(~F.col("is_keeper")).count()
    full_sec = round(time.time() - t0, 2)
    vecs.unpersist()

    print(
        json.dumps(
            {
                "probe": "semdedup",
                "n_vec": n_vec,
                "planted_pairs": planted_pairs,
                "kmeans_fit_sec": fit_sec,
                "edge_scan_sec": edges_sec,
                "n_edges": n_edges,
                "full_pipeline_sec": full_sec,
                "n_dropped": n_dropped,
                "planted_recovered": n_dropped == planted_pairs,
            }
        )
    )

    # --- probe 2: substring-level dup stats -------------------------------
    docs = boilerplate_docs(spark, n_docs).cache()
    docs.count()
    t0 = time.time()
    stats = D.ngram_dup_stats(docs, n=8)
    agg = stats.agg(
        F.count("*").alias("docs"),
        F.sum((F.col("n_dup_grams") >= 3).cast("long")).alias("flagged"),
        F.sum("n_dup_grams").alias("total_dup_grams"),
    ).collect()[0]
    sec = round(time.time() - t0, 2)
    docs.unpersist()
    print(
        json.dumps(
            {
                "probe": "ngram_dup_stats",
                "n_docs": n_docs,
                "sec": sec,
                "mdocs_per_sec": round(n_docs / sec / 1e6, 2),
                "docs_flagged": agg["flagged"],
                "expected_flagged": n_docs // 10,
                "total_dup_grams": agg["total_dup_grams"],
            }
        )
    )


def extra_probes(spark, n_vec: int, n_docs: int) -> None:
    """Probes 3-6 (see module doc) — separated so the default run stays
    the two headline probes; run with ``--all`` to include these."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.functions import (
        vector as V,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators.semdedup import (
        assign_to_centroids,
        cluster_assign,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        semdedup as SS,
    )

    # 3. strip at n_docs
    docs = boilerplate_docs(spark, n_docs).cache()
    docs.count()
    t0 = time.time()
    agg = D.strip_dup_ngrams(docs, n=8).agg(
        F.sum("n_removed_tokens").alias("removed"),
        F.sum((F.col("n_removed_tokens") > 0).cast("long")).alias("touched"),
    ).collect()[0]
    print(
        json.dumps(
            {
                "probe": "strip_dup_ngrams",
                "n_docs": n_docs,
                "sec": round(time.time() - t0, 2),
                "tokens_removed": agg["removed"],
                "expected_removed": (n_docs // 10) * 10,
                "docs_touched": agg["touched"],
            }
        )
    )
    docs.unpersist()

    # 4. sampled vs full k-means fit
    vecs = dup_vectors(spark, n_vec).cache()
    vecs.count()
    out = {"probe": "sampled_kmeans_fit", "n_vec": n_vec}
    for frac in (1.0, 0.1):
        t0 = time.time()
        a = (
            cluster_assign(
                vecs, k_clusters=64, max_iter=5, fit_fraction=frac
            )
            .select(F.col("vec_id").alias("id"), F.col("cluster_id").alias("c"))
            .localCheckpoint(eager=True)  # fit+assign materialized HERE
        )
        sec = round(time.time() - t0, 2)  # verification excluded
        dup = a.filter(F.col("id") >= int(n_vec * 0.9)).withColumn(
            "orig", F.col("id") - int(n_vec * 0.9)
        )
        split = (
            dup.join(
                a.select(F.col("id").alias("orig"), F.col("c").alias("c2")),
                "orig",
            )
            .filter(F.col("c") != F.col("c2"))
            .count()
        )
        key = "full" if frac >= 1.0 else f"frac_{frac}"
        out[f"{key}_sec"] = sec
        out[f"{key}_split_pairs"] = split
    print(json.dumps(out))

    # 5. streaming incremental batch vs a prior-ingest store
    import shutil
    import tempfile

    uniq = vecs.filter(F.col("vec_id") < int(n_vec * 0.9))
    cents = SS.fit_frozen_centroids(uniq, k_clusters=64, max_iter=5)
    tmp = tempfile.mkdtemp(prefix="ssprobe_")
    try:
        store, matches = f"{tmp}/store", f"{tmp}/matches"
        reg = assign_to_centroids(
            uniq.select(F.col("vec_id").cast("long").alias("id"), "embedding"),
            cents,
        )
        reg = reg.withColumn("__n", V.l2_norm("embedding")).select(
            "id",
            "cluster_id",
            F.transform(
                "embedding", lambda x: x.cast("double") / F.col("__n")
            ).alias("vec"),
        )
        # Seed the prior-ingest store EPOCH-KEYED (epoch=0) so the
        # epoch-keyed batch call below passes the mixed-layout guard.
        reg.write.partitionBy("cluster_id").parquet(f"{store}/epoch=0")
        n_dup_batch = min(5000, n_vec - int(n_vec * 0.9))
        batch = vecs.filter(
            (F.col("vec_id") >= int(n_vec * 0.9))
            & (F.col("vec_id") < int(n_vec * 0.9) + n_dup_batch)
        )
        # Exact id range (not limit — which may grab the generator's own
        # wraparound dups): content == id here, so these are fresh uniques.
        fresh = dup_vectors(spark, 3 * n_vec).filter(
            (F.col("vec_id") >= int(2.0 * n_vec))
            & (F.col("vec_id") < int(2.0 * n_vec) + n_dup_batch)
        )
        t0 = time.time()
        SS.detect_and_register(
            batch.unionByName(fresh),
            cents,
            store,
            matches,
            eps=0.05,
            epoch_id=7,
            max_store_cluster=n_vec,
        )
        n_matches = spark.read.parquet(matches).count()
        print(
            json.dumps(
                {
                    "probe": "streaming_semdedup_batch",
                    "store_rows": int(n_vec * 0.9),
                    "batch_rows": 2 * n_dup_batch,
                    "sec": round(time.time() - t0, 2),
                    "matches": n_matches,
                    "expected_matches": n_dup_batch,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    vecs.unpersist()

    # 6. streaming substring ingest: batch vs an accumulated gram store
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.streaming import (
        substring as SB,
    )

    n9 = int(n_docs * 0.9)
    all_docs = boilerplate_docs(spark, n_docs)
    tmp = tempfile.mkdtemp(prefix="sbprobe_")
    try:
        gram_d, s_d = f"{tmp}/grams", f"{tmp}/stats"
        t0 = time.time()
        SB.detect_and_register(
            all_docs.filter(F.col("doc_id") < n9), gram_d, s_d, n=8,
            epoch_id=0,
        )
        seed_sec = round(time.time() - t0, 2)
        t0 = time.time()
        SB.detect_and_register(
            all_docs.filter(F.col("doc_id") >= n9), gram_d, s_d, n=8,
            epoch_id=1,
        )
        batch_sec = round(time.time() - t0, 2)
        flagged = (
            spark.read.parquet(f"{s_d}/epoch=1")
            .filter(F.col("n_dup_grams") > 0)
            .count()
        )
        print(
            json.dumps(
                {
                    "probe": "streaming_substring_batch",
                    "store_docs": n9,
                    "batch_docs": n_docs - n9,
                    "seed_sec": seed_sec,
                    "batch_sec": batch_sec,
                    "batch_docs_flagged": flagged,
                    # planted docs are ids % 10 == 0: count them in [n9, n_docs)
                    "expected_flagged": (n_docs + 9) // 10 - (n9 + 9) // 10,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
    if "--all" in sys.argv:
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (
            get_spark as _gs,
        )

        args = [a for a in sys.argv[1:] if a != "--all"]
        n_vec = int(args[0]) if args else 1_000_000
        n_docs = int(args[1]) if len(args) > 1 else 1_000_000
        extra_probes(_gs(app_name="semdedup-probe"), n_vec, n_docs)
