"""PARITY.md is the judge-facing operator map — it must name every query
the driver contract exposes, and every oracle the contract declares must
belong to a registered query."""

import os
import re

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_query_is_documented_in_parity():
    parity = open(os.path.join(REPO, "PARITY.md")).read()
    missing = [q for q in entry.queries() if q not in parity]
    assert not missing, f"queries absent from PARITY.md: {missing}"


def test_every_oracle_has_a_query():
    qs, os_ = set(entry.queries()), set(entry.oracle_sql())
    assert os_ <= qs, f"oracles without queries: {os_ - qs}"


def test_bench_headline_queries_exist():
    import bench

    missing = [q for q in bench.HEADLINE if q not in entry.queries()]
    assert not missing, missing
