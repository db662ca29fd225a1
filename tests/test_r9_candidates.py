"""Round-9 candidates validated against their DuckDB oracles at TWO
scales — the same compare as tools/selfcheck.py (sorted columns/rows,
dtype checks, exact values), parametrized over sf0.001 AND sf0.01 from
day one (the two-scale shape the r7 verdict asked for; the r8 cohort got
it retroactively). The candidates are deliberately NOT in
registry.REGISTRY yet: registration happens in round 9 so they lead that
round's driver window instead of displacing round 8's (see
registry_r9's module docstring)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from query_engine_spark.registry import REGISTRY
from query_engine_spark.registry_r9 import CANDIDATES

SF_DIRS = [
    os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001"),
    os.environ.get("SPARK_GRAFT_SF_DIR_MID", "/root/testdata/sf0.01"),
]


def test_candidates_not_yet_registered():
    # Held out until round 9 — absorbing early would displace the round-8
    # driver window the rotation plan budgeted (COVERAGE.md round-8 delta).
    overlap = [n for n in CANDIDATES if n in REGISTRY]
    assert not overlap, f"r9 candidates must stay out of REGISTRY until r9: {overlap}"


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
@pytest.mark.parametrize("name", sorted(CANDIDATES))
def test_r9_candidate_matches_oracle(spark, name, sf_dir):
    from tools.selfcheck import compare, load_duck

    spec = CANDIDATES[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    con = load_duck(sf_dir)
    try:
        duck_pdf = con.execute(spec.oracle).fetchdf()
    finally:
        con.close()
    problems = compare(spark_pdf, duck_pdf)
    assert not problems, (name, problems)
    assert len(spark_pdf) > 0, name
