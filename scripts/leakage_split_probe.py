"""Leakage-safe split scale probe (operators/dedup.leakage_safe_split) —
the ≥1M-doc datapoint for the cluster-aware train/val/test split via the
BANDED pair source (VERDICT r9 next-round #3).

The driver oracle rows run the df-capped exact-Jaccard form at fixture
scale; this probe runs the 100 TB composition: ``minhash_lsh_pairs``
(32 hashes / 8 bands) finds the near-dup pair graph ONCE, and
``leakage_safe_split(pairs=...)`` reuses it — the split then costs one
O(log n) component contraction plus scan-shaped hashing on top of the
dedup pass the corpus already pays.

Corpus: N docs x 20 tokens generated JVM-side.  The last ``n_dup`` docs
repeat the text of doc ``id - n_base`` verbatim — planted near-dup pairs
``(i, i + n_base)`` whose members are far apart in id space, so under the
DOC-LEVEL split hash a predictable ~18% of them straddle a split boundary
(2·(0.90·0.05 + 0.90·0.05 + 0.05·0.05) ≈ 0.1825 for 90/5/5).  Verbatim
copies have identical MinHash signatures, so banding surfaces every
planted pair deterministically — the zero-leakage assertion is exact, not
probabilistic.

Asserts:
- ZERO planted pairs straddle the leakage-safe split (both members carry
  the representative's split);
- the doc-level split WOULD have leaked (straddle count > 0, recorded);
- split proportions ~90/5/5 over representatives.

Run: ``python scripts/leakage_split_probe.py [n_docs] [n_dup]`` (default
1,000,000 / 10,000).  Prints one JSON line, BASELINE.md-ready.
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
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators.textstats import (  # noqa: E402
    hash_bucket,
)


def synthetic_corpus(spark, n: int, n_dup: int, parts: int = 64):
    """N docs x 20 tokens from a 500k-word vocabulary; ids >= n - n_dup
    repeat the text of ``id - (n - n_dup)`` verbatim (planted pairs whose
    members sit ~n apart in id space)."""
    n_base = n - n_dup
    seed = F.when(
        F.col("id") >= n_base, F.col("id") - F.lit(n_base)
    ).otherwise(F.col("id"))
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    F.pmod(F.hash(seed, F.lit(j)), F.lit(500_000)),
                )
                for j in range(20)
            ],
        ).alias("text"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_dup = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    n_base = n_docs - n_dup
    spark = get_spark(app_name="leakage-split-probe")
    results: dict = {"n_docs": n_docs, "n_planted_pairs": n_dup}

    docs = synthetic_corpus(spark, n_docs, n_dup).cache()
    docs.count()

    # 1. The banded pair graph — the dedup pass the corpus pays anyway.
    t0 = time.time()
    pairs = D.minhash_lsh_pairs(
        docs, "text", "doc_id", n=3, num_hashes=32, bands=8, threshold=0.8
    ).cache()
    n_pairs = pairs.count()
    results["minhash_pairs_sec"] = round(time.time() - t0, 2)
    results["n_pairs"] = n_pairs

    # Every planted pair must be IN the graph (verbatim copies -> equal
    # signatures -> same band buckets; the zero-leakage claim below is
    # exact because of this, not sampling luck).
    planted_found = pairs.filter(
        (F.col("id_b") - F.col("id_a") == F.lit(n_base))
        & (F.col("id_b") >= F.lit(n_base))
    ).count()
    results["planted_pairs_in_graph"] = planted_found
    assert planted_found == n_dup, (planted_found, n_dup)

    # 2. The split, reusing the pair table (pairs= — no second shingling).
    t0 = time.time()
    split = D.leakage_safe_split(docs, "text", "doc_id", pairs=pairs).cache()
    n_rows = split.count()
    results["split_sec"] = round(time.time() - t0, 2)
    assert n_rows == n_docs
    results["split_mdoc_per_sec"] = round(n_docs / results["split_sec"] / 1e6, 3)

    # 3. Zero leakage: planted pair members share a split, exactly.
    a = split.filter(F.col("doc_id") < n_dup).select(
        F.col("doc_id").alias("pid"), F.col("split").alias("split_a")
    )
    b = split.filter(F.col("doc_id") >= n_base).select(
        (F.col("doc_id") - F.lit(n_base)).alias("pid"),
        F.col("split").alias("split_b"),
    )
    straddle = a.join(b, "pid").filter("split_a <> split_b").count()
    results["leakage_pairs"] = straddle
    assert straddle == 0, f"{straddle} planted pairs straddle the split"

    # 4. The counterfactual: the doc-level hash split WOULD have leaked.
    doc_split = F.when(hash_bucket("doc_id", 100) < 90, "train").when(
        hash_bucket("doc_id", 100) < 95, "validation"
    ).otherwise("test")
    d = docs.select("doc_id", doc_split.alias("dsplit"))
    da = d.filter(F.col("doc_id") < n_dup).select(
        F.col("doc_id").alias("pid"), F.col("dsplit").alias("sa")
    )
    db = d.filter(F.col("doc_id") >= n_base).select(
        (F.col("doc_id") - F.lit(n_base)).alias("pid"),
        F.col("dsplit").alias("sb"),
    )
    doc_leak = da.join(db, "pid").filter("sa <> sb").count()
    results["doc_level_leakage_pairs"] = doc_leak
    assert doc_leak > 0, "counterfactual must show the doc-level leak"

    # 5. Split proportions (over all docs; reps dominate).
    dist = {r["split"]: r["c"] for r in split.groupBy("split").agg(
        F.count("*").alias("c")).collect()}
    results["split_distribution"] = dist

    docs.unpersist()
    pairs.unpersist()
    split.unpersist()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
