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

``--gumbel`` (r10, VERDICT r9 next-round #7) adds probe 4: the Gumbel
top-k RESAMPLING mode (``dsir_select(gumbel_seed=7)``) at the same
corpus size — wall + features/sec, the planted-signal precision of the
SAMPLE, and the out-of-engine reproducibility witness at scale: every
row's ranking key is recomputed by the pure-Python XXH64+Gumbel
reference (``gumbel_rank_key_py``) in a distributed pandas UDF, keys
compared within 1e-9 (bitwise equality is impossible across JVM
Math.log vs libm log), and the reference's OWN top-k flag set diffed
against Spark's — both counts must be 0 for the seeded sample to be
reproducible outside Spark at production scale, the same witness the
``dsir_select_gumbel`` fixture query carries at 500 docs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    gumbel = "--gumbel" in sys.argv[1:]
    n_docs = int(args[0]) if len(args) > 0 else 1_000_000
    hash_fn = args[1] if len(args) > 1 else "md5"
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
    gnorms: list[float] = []
    t0 = time.time()
    w, b, losses = S.train_logreg_hashed(
        labeled, "y", m=m, iters=iters, lr=4.0, l2=0.0, hash_fn=hash_fn,
        grad_norms=gnorms,
    )
    train_sec = time.time() - t0
    results["train_iters"] = iters
    results["train_total_sec"] = round(train_sec, 2)
    results["train_per_iter_sec"] = round(train_sec / iters, 2)
    results["train_loss_trajectory"] = [round(x, 4) for x in losses]
    results["train_grad_norm_trajectory"] = [round(x, 5) for x in gnorms]
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

    # 4. (--gumbel) The resampling mode at scale + its out-of-engine
    #    reproducibility witness (module docstring).
    if gumbel:
        t0 = time.time()
        gsel = S.dsir_select(
            docs, F.col("is_target"), k=k, m=m, bigrams=True,
            hash_fn=hash_fn, gumbel_seed=7, emit_key=True,
        ).cache()
        n_gsel = gsel.filter("selected").count()
        results["gumbel_sec"] = round(time.time() - t0, 2)
        feats = 2 * 48 - 1
        results["gumbel_mfeat_per_sec"] = round(
            n_docs * feats / results["gumbel_sec"] / 1e6, 3
        )
        results["gumbel_selected"] = n_gsel
        ghits = (
            gsel.filter("selected")
            .join(docs.select("doc_id", "is_target"), "doc_id")
            .filter("is_target")
            .count()
        )
        results["gumbel_target_precision"] = round(ghits / n_gsel, 4)

        ref_fn = S.gumbel_rank_key_py

        @F.pandas_udf("double")
        def ref_key(doc_id: pd.Series, mean_milli: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    ref_fn(int(i), int(mm), 7)
                    for i, mm in zip(doc_id, mean_milli)
                ]
            )

        t0 = time.time()
        keyed = gsel.withColumn(
            "ref_key", ref_key("doc_id", "mean_milli")
        ).localCheckpoint(eager=True)
        key_diff = keyed.filter(
            F.abs(F.col("rank_key") - F.col("ref_key")) > 1e-9
        ).count()
        # The reference's own top-k under the same (key, -id) total order
        # — the TakeOrdered threshold trick, applied to the ref keys.
        ranked = F.struct(
            F.col("ref_key").alias("key"), (-F.col("doc_id")).alias("neg_id")
        )
        thr = (
            keyed.select(ranked.alias("r"))
            .orderBy(F.col("r").desc())
            .limit(k)
            .agg(F.min("r").alias("thr"))
        )
        flag_diff = (
            keyed.crossJoin(F.broadcast(thr))
            .filter((ranked >= F.col("thr")) != F.col("selected"))
            .count()
        )
        results["gumbel_witness_sec"] = round(time.time() - t0, 2)
        results["gumbel_key_diff_gt_1e9"] = key_diff
        results["gumbel_flag_diff"] = flag_diff
        assert key_diff == 0 and flag_diff == 0, (key_diff, flag_diff)
        gsel.unpersist()

    docs.unpersist()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
