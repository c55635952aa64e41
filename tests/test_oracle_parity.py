"""Driver-style differential test: every registered query with an oracle
twin must match DuckDB exactly at sf0.001 (the driver runs the same check
at sf0.01)."""

from __future__ import annotations

import pytest

from dend_covid19_spark import plans
from tests.conftest import SF_DIR, assert_matches_oracle


def _names():
    return sorted(plans.all_queries())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, name):
    spec = plans.get_spec(name)
    df = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        # rows-only check (driver's weaker path for non-SQL-expressible ops)
        assert df.count() >= 0
        assert len(df.columns) > 0
        return
    assert_matches_oracle(df, duck, spec.oracle, name=name)


def test_all_queries_nonempty(spark):
    """Every declared query should produce >0 rows at sf0.001 — an empty
    result would make the hash check vacuous."""
    for name in _names():
        spec = plans.get_spec(name)
        assert spec.fn(spark, SF_DIR).limit(1).count() > 0, f"{name} returned 0 rows"
