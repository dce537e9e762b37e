"""Plan-shape regression gate: every headline query's physical plan must
keep its golden operator signature (shuffle count, join strategy, Python
boundaries — plans/explain.plan_signature).

Correctness tests can stay green while a plan silently degrades (broadcast
→ sort-merge, an extra exchange, a Python node in a hot path); this gate
makes the SHAPE itself a tested contract.  After reviewing an intentional
plan change, regenerate with ``python scripts/gen_plan_goldens.py``.
"""

from __future__ import annotations

import json
import os

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (
    queries as Q,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.plans import (
    explain as E,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.plans.probes import (
    PLAN_PROBES,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_plans.json")


def _goldens() -> dict[str, dict[str, int]]:
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.mark.parametrize("name", sorted(_goldens()))
def test_plan_signature_matches_golden(spark, sf_dir, name):
    # Pipeline queries share a cached ingest; a materialized cache changes
    # the printed plan (InMemoryTableScan subtree), so signatures are
    # always taken from the fresh, unmaterialized state.
    Q.clear_ingest_cache()
    fn = PLAN_PROBES.get(name) or Q.QUERIES[name]
    got = E.plan_signature(fn(spark, sf_dir))
    want = _goldens()[name]
    assert got == want, (
        f"{name}: plan shape changed.\n golden: {want}\n    got: {got}\n"
        "If intentional, review and run scripts/gen_plan_goldens.py."
    )
