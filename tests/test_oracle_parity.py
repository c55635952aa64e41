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


def test_all_queries_nonempty(spark, registry_dfs):
    """Every declared query should produce >0 rows at sf0.001 — an empty
    result would make the hash check vacuous. Uses the session's shared
    build pass and overlaps the per-query limit(1) actions from a small
    thread pool (read-only actions on already-built frames; no conf
    mutation happens at action time)."""
    from concurrent.futures import ThreadPoolExecutor

    def probe(name):
        return name, registry_dfs[name].limit(1).count()

    with ThreadPoolExecutor(max_workers=8) as pool:
        for name, n in pool.map(probe, sorted(registry_dfs)):
            assert n > 0, f"{name} returned 0 rows"
