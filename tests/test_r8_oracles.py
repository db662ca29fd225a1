"""Round-8 registry candidates validated against their DuckDB oracles
TODAY — the same compare as tools/selfcheck.py (sorted columns/rows,
dtype checks, exact values) at sf0.001, so round-8 registration carries
no oracle risk. One test per candidate for attributable failures."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from query_engine_spark.registry_r8 import CANDIDATES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(CANDIDATES))
def test_r8_candidate_matches_oracle(spark, name):
    from tools.selfcheck import compare, load_duck

    spec = CANDIDATES[name]
    spark_pdf = spec.fn(spark, SF_DIR).toPandas()
    con = load_duck(SF_DIR)
    try:
        duck_pdf = con.execute(spec.oracle).fetchdf()
    finally:
        con.close()
    problems = compare(spark_pdf, duck_pdf)
    assert not problems, (name, problems)
    assert len(spark_pdf) > 0, name
