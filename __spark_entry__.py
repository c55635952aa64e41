"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Everything is delegated to the ``dend_covid19_spark`` package; the query
registry (dend_covid19_spark/plans/registry.py) is populated by importing
the plans/operators modules.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)
# Python workers inherit PYTHONPATH (not the driver's sys.path mutations);
# make the package importable there too for any UDF pickled by reference.
os.environ["PYTHONPATH"] = _REPO_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")

from dend_covid19_spark import plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    events.ts handling lives in catalog.load_table: the parquet footer is
    sniffed per dataset, timestamp[us]/[ms] reads natively as
    TimestampType, and only genuine TIMESTAMP(NANOS) files take the
    nanosAsLong + integer-DIV path (the catalog sets that conf itself
    when needed). Here we only pin UTC so results match the oracle.
    """
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    return plans.get_spec("flagship_daily_join").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (and the
    LLM-pipeline extensions). Each callable takes (spark, sf_dir)."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            try:
                spark.conf.set("spark.sql.session.timeZone", "UTC")
                # Self-configure the engine's intended shuffle width on
                # the driver's vanilla session (like the UTC pin): the
                # 200-partition SQL default costs pure task overhead at
                # driver scale — worst for the executed-streaming rows,
                # whose state stores freeze at this width per micro-
                # batch. Every result is partitioning-independent by
                # design (fuzz-tested), so this changes wall-clock only.
                from dend_covid19_spark.session import DEFAULT_SHUFFLE_PARTITIONS

                if spark.conf.get("spark.sql.shuffle.partitions") == "200":
                    spark.conf.set(
                        "spark.sql.shuffle.partitions",
                        str(DEFAULT_SHUFFLE_PARTITIONS),
                    )
            except Exception:
                pass
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in plans.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each oracle-checkable query."""
    return plans.all_oracles()
