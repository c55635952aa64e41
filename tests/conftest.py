"""Shared fixtures: one SparkSession per test session + a DuckDB oracle
harness that mirrors the driver's CORRECTNESS check (row-count + schema
column names + order-insensitive value comparison) at sf0.001 for speed."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dend_covid19_spark.catalog import TABLE_NAMES  # noqa: E402
from dend_covid19_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dend-covid19-spark-tests")
    yield s


@pytest.fixture(scope="session")
def registry_dfs(spark):
    """Every registered query built ONCE for the session's full-registry
    sweep tests (r18: test_all_queries_nonempty and
    test_no_query_plans_cartesian each rebuilt all ~280 DataFrames —
    for side-effecting rows that means re-entering the drain-and-cache
    path — ~290 s of suite wall between them; one shared build pass
    roughly halves it). Built SEQUENTIALLY: side-effecting rows
    set/restore session confs around their drains, which must not
    interleave across threads."""
    from dend_covid19_spark import plans

    reg = plans.all_queries()
    return {name: reg[name](spark, SF_DIR) for name in sorted(reg)}


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    """Normalize a cell for order-insensitive comparison."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        # exact repr: both engines must agree bit-for-bit after our
        # decimal-stabilized aggregation; no tolerance is applied, to
        # mirror a value-hash check.
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def assert_matches_oracle(spark_df, duck_con, sql: str, name: str = "?"):
    """Strict driver-style compare: row count, column-name set, and the
    multiset of rows (columns sorted by name, rows sorted)."""
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    rel = duck_con.execute(sql)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s_set = sorted(tuple(_norm(r[i]) for i in order) for r in spark_rows)
    d_set = sorted(tuple(_norm(r[i]) for i in dorder) for r in duck_rows)
    for i, (a, b) in enumerate(zip(s_set, d_set)):
        assert a == b, f"{name}: first differing row #{i}: spark={a} duck={b}"
