"""Plan-only probes for the golden-signature gate.

A lazy ``localCheckpoint`` boundary truncates lineage the moment the
Dataset is constructed, so a composed pipeline's golden signature pins
only its post-boundary sub-plan — a plan regression in the upstream
gate / fingerprint / tercile stages would no longer trip the gate
(ADVICE r10, tests/golden_plans.json).  These probes re-build exactly
the PRE-boundary subtrees (the operators expose them as named functions
so probe and pipeline cannot drift) and get their own golden entries.

Probes are plan-only: they are never driver queries (no oracle, no
``queries()`` entry) — ``scripts/gen_plan_goldens.py`` and
``tests/test_plan_signatures.py`` consult this registry alongside
``queries.QUERIES``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..tables import load_table


def _v1_pre_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    return D.curation_v1_survivors(docs)


def _v2_pre_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    # min_stops=0, matching the curation_v2_pipeline driver query.
    return D.curation_v2_gated(docs, min_stops=0, checkpoint_gate=False)


def _minhash_band_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators import dedup as D
    from ..utils import spread

    # The signature -> band-key subtree of minhash_lsh_pairs (driver
    # params: n=3, num_hashes=32, bands=8, max_df=None), WITHOUT the r12
    # ``banded`` localCheckpoint, so the golden pins the num_hashes-way
    # MinHash fold + band explode that the boundary truncates out of the
    # final plan's signature.
    docs = load_table(spark, sf_dir, "documents")
    sh = spread(docs).select(
        F.col("doc_id").alias("id"),
        D.word_shingles("text", 3).alias("shingles"),
    )
    return D.minhash_band_keys(sh, num_hashes=32, bands=8)


def _v3_strip_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators import dedup as D

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("the of and that have with "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    # Same overlay + min_stops as the curation_v3_pipeline driver query,
    # WITHOUT the gated2 checkpoint, so the signature pins gate ->
    # terciles -> fingerprint dedup -> span strip in one plan.
    return D.curation_v2_kept(
        D.curation_v2_gated(docs, min_stops=2, checkpoint_gate=False),
        strip_spans=True
    )


PLAN_PROBES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # curate_corpus's gate -> fingerprint agg -> survivor join subtree,
    # i.e. everything corpus_curation_pipeline's golden lost to the
    # boundary (Exchange 7 -> 4 at the r10 regeneration).
    "corpus_curation_pipeline__pre_boundary": _v1_pre_boundary,
    # curate_corpus_v2's Gopher gate -> tercile join subtree (the
    # boundary there sits before the fingerprint agg).
    "curation_v2_pipeline__pre_boundary": _v2_pre_boundary,
    # curation_v3's gate -> tercile -> exact dedup -> span strip chain
    # (the v3 final plan truncates at the surv boundary, which would
    # otherwise leave the strip stage's shape unpinned).
    "curation_v3_pipeline__strip_stage": _v3_strip_stage,
    # minhash_lsh_pairs' signature -> band-key subtree (the r12 ``banded``
    # boundary truncates it out of the final plan's golden — the two
    # Generate nodes the pre-r12 signature carried).
    "minhash_lsh_pairs__band_stage": _minhash_band_stage,
}
