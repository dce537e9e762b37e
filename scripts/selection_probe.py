"""Selection-stage scale probe (operators/selection.py) — measure the
Moore-Lewis/DSIR scorer and the hashed-classifier train/serve loop well
beyond fixture sizes, with a planted domain skew so the probe also
witnesses the SIGNAL, not just the wall clock.

Corpus: N docs x ~48 tokens generated JVM-side (``sequence``/``transform``
over ``hash(id, j)`` — no Python, no files).  A 20% "target-domain" slice
draws tokens from a 500-word vocabulary; the remaining 80% from a
5000-word vocabulary overlapping the first (the classic
narrow-domain-inside-broad-pool shape both methods exist for).

Probes (all through the exact operator code paths the driver queries use):

1. ``dsir_select`` end-to-end at m=65536 buckets with bigrams —
   feature explode + two bucket LMs + broadcast delta join + top-k flag.
   Records wall, features/sec, and the planted-signal precision of the
   top-k (fraction of selected docs that are target-domain: ~1.0 when
   the score works, ~0.2 under the null).
2. ``train_logreg_hashed`` at m=65536, 5 iterations — records total and
   per-iteration wall (the per-iteration number is the steady-state cost
   a real 20-50 iteration run pays) plus the first/last loss.
3. ``score_hashed_linear`` serving pass with the trained weights —
   records wall and docs/sec, and trained-classifier accuracy against
   the planted domain label.

Run: ``python scripts/selection_probe.py [n_docs] [hash_fn]`` (default
1M, md5).  ``hash_fn=xx64`` probes the PRODUCTION hash family (native
xxhash64 — no md5 hex parse; ~1.6x faster at 4M docs per the r8
measurement); md5 stays the default because it is the oracle-twin
convention the driver queries use.  Prints one JSON line,
BASELINE.md-ready.
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
    selection as S,
)


def synthetic_corpus(spark, n: int, toks_per_doc: int = 48, parts: int = 64):
    """Deterministic word-salad with a planted 20% target-domain slice.

    Target docs (hash(id) mod 5 == 0) draw token ids mod 500; pool docs
    mod 5000 — overlapping vocabularies, distinct distributions."""
    is_target = F.pmod(F.hash(F.col("id")), F.lit(5)) == F.lit(0)
    vocab = F.when(is_target, F.lit(500)).otherwise(F.lit(5000))
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("doc_id"),
        is_target.alias("is_target"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(toks_per_doc)),
                lambda j: F.concat(
                    F.lit("w"),
                    F.pmod(F.hash(F.col("id"), j), vocab).cast("string"),
                ),
            ),
            " ",
        ).alias("text"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    hash_fn = sys.argv[2] if len(sys.argv) > 2 else "md5"
    m = 65536
    spark = get_spark(app_name="selection-probe")
    results: dict[str, float | int | str] = {
        "n_docs": n_docs, "m_buckets": m, "hash_fn": hash_fn,
    }

    docs = synthetic_corpus(spark, n_docs).cache()
    docs.count()
    k = max(n_docs // 20, 100)  # select 5% — well inside the 20% slice

    # 1. DSIR / Moore-Lewis end-to-end (score + rank + flag).
    t0 = time.time()
    sel = S.dsir_select(
        docs, F.col("is_target"), k=k, m=m, bigrams=True, hash_fn=hash_fn
    ).cache()
    n_sel = sel.filter("selected").count()
    results["dsir_sec"] = round(time.time() - t0, 2)
    feats = 2 * 48 - 1  # unigrams + bigrams per doc
    results["dsir_mfeat_per_sec"] = round(
        n_docs * feats / results["dsir_sec"] / 1e6, 3
    )
    hits = (
        sel.filter("selected")
        .join(docs.select("doc_id", "is_target"), "doc_id")
        .filter("is_target")
        .count()
    )
    results["dsir_selected"] = n_sel
    results["dsir_top_k_target_precision"] = round(hits / n_sel, 4)
    sel.unpersist()

    # 2. Distributed logistic-regression training (5 iterations).
    labeled = docs.withColumn("y", F.col("is_target").cast("int"))
    iters = 5
    t0 = time.time()
    w, b, losses = S.train_logreg_hashed(
        labeled, "y", m=m, iters=iters, lr=4.0, l2=0.0, hash_fn=hash_fn
    )
    train_sec = time.time() - t0
    results["train_iters"] = iters
    results["train_total_sec"] = round(train_sec, 2)
    results["train_per_iter_sec"] = round(train_sec / iters, 2)
    results["train_loss_first"] = round(losses[0], 4)
    results["train_loss_last"] = round(losses[-1], 4)

    # 3. Serving pass with the trained weights + planted-label accuracy.
    t0 = time.time()
    scored = S.score_hashed_linear(
        docs, w, m=m, bias=b, score_col="s", hash_fn=hash_fn
    )
    acc = (
        scored.join(labeled.select("doc_id", "y"), "doc_id")
        .select(
            F.avg(
                ((F.col("s") >= 0).cast("int") == F.col("y")).cast("double")
            ).alias("acc")
        )
        .first()["acc"]
    )
    results["serve_sec"] = round(time.time() - t0, 2)
    results["serve_mdoc_per_sec"] = round(
        n_docs / results["serve_sec"] / 1e6, 3
    )
    results["classifier_accuracy"] = round(acc, 4)

    docs.unpersist()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
