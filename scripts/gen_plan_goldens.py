"""Regenerate tests/golden_plans.json — the per-query physical-plan shape
fingerprints (scale-defining operator counts, plans/explain.plan_signature).

Run after REVIEWING an intentional plan change:

    python scripts/gen_plan_goldens.py

The goldens pin every bench headline query plus the round-2 training ops
at sf0.001 (the tests' fixture scale).  A diff here is a plan regression
gate tripping: a broadcast degraded to sort-merge, an extra exchange, a
Python node entering a hot path — review the new shape before committing.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (  # noqa: E402
    get_spark,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (  # noqa: E402
    queries as Q,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.plans import (  # noqa: E402
    explain as E,
)

SF_DIR = "/root/testdata/sf0.001"

EXTRA = [
    "pii_redaction",
    "repetition_signals",
    "sequence_packing",
    "domain_mixture_sample",
    "ngram_dup_stats",
    "strip_dup_ngrams",
    "unigram_surprisal",
    # r8 selection stage (operators/selection.py)
    "dsir_select",
    "quality_classifier_fixed_weights",
    # r8: SemDeDup mechanism oracle row (operators/semdedup.py)
    "semantic_dedup_fixed_centroids",
    # r8: LSH banding mechanism oracle row (operators/dedup.py)
    "minhash_lsh_pairs_md5",
    # r8: projection-LSH mechanism oracle row (operators/ann.py)
    "embedding_lsh_fixed_planes",
    # r9: the pipeline-bench suite's most expensive member — gate its
    # plan shape, not just its recorded wall-clock (operators/dedup.py
    # curate_corpus: gates -> fingerprint dedup -> df-capped jaccard ->
    # star components -> anti-join).
    "corpus_curation_pipeline",
    # r10: the composed curation-v2 run (gopher -> ccnet terciles ->
    # exact dedup -> shared pair graph -> leakage split + near-dup drop
    # -> DSIR) — the new pipeline-bench member gets the same plan gate.
    "curation_v2_pipeline",
    # r11: the v3 composition (span strip + live stop-word gate).
    "curation_v3_pipeline",
]


def main() -> None:
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.plans.probes import (  # noqa: E402,E501
        PLAN_PROBES,
    )

    spark = get_spark(app_name="plan-goldens", cpus=8, driver_memory="8g")
    out: dict[str, dict[str, int]] = {}
    for name in list(bench.HEADLINE) + EXTRA:
        out[name] = E.plan_signature(Q.QUERIES[name](spark, SF_DIR))
    # Plan-only pre-boundary probes (ADVICE r10): the localCheckpoint
    # boundaries truncate the composed pipelines' signatures, so the
    # upstream subtrees get their own golden entries.
    for name, fn in PLAN_PROBES.items():
        out[name] = E.plan_signature(fn(spark, SF_DIR))
    path = os.path.join(REPO, "tests", "golden_plans.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path} ({len(out)} signatures)")


if __name__ == "__main__":
    main()
