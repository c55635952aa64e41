"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The reference's only non-file source is an HTTP API pull
(/root/reference/airflow/dags/tasks/market.py:21-27 — Quandl JSON into
a DataFrame); S4 stands in for it with a file-backed reader. This
module covers the ENGINE surface such a connector would actually use
on Spark 4: a first-class `DataSource` registered under a format name,
with a schema, a partition planner, and per-partition generator reads
that execute IN PARALLEL on the workers — i.e. the modern way to wrap
any external API/feed as a real table instead of collecting to the
driver.

The demo source is a deterministic calendar spine (seq, day, dow,
is_weekend) over `days` rows starting at `start`: deterministic so the
DuckDB oracle can regenerate it from pure arithmetic
(`generate_series` + date offset + seq % 7), partitioned so the read
path exercises `partitions()` fan-out, not a single generator.

Worker-side note: the class pickles by reference, so the package must
be importable on executors — __spark_entry__ exports PYTHONPATH before
the session starts, which is the same contract every pickled-by-
reference UDF here already relies on.
"""

from __future__ import annotations

from datetime import date, timedelta

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SPINE_FORMAT = "graft_spine"
SPINE_DEFAULT_START = "1992-01-01"
SPINE_DEFAULT_DAYS = 364
SPINE_PARTS = 8


class _SpinePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class SpineReader(DataSourceReader):
    def __init__(self, options):
        self.start = date.fromisoformat(
            options.get("start", SPINE_DEFAULT_START)
        )
        self.days = int(options.get("days", SPINE_DEFAULT_DAYS))
        self.n_parts = int(options.get("numPartitions", SPINE_PARTS))

    def partitions(self):
        # contiguous seq ranges -> each executor task generates its own
        # slice; ceil-split so every row lands in exactly one partition
        per = -(-self.days // self.n_parts)
        return [
            _SpinePartition(lo, min(lo + per, self.days))
            for lo in range(0, self.days, per)
        ]

    def read(self, partition: _SpinePartition):
        for seq in range(partition.lo, partition.hi):
            dow = seq % 7
            yield (
                seq,
                self.start + timedelta(days=seq),
                dow,
                dow in (5, 6),
            )


class SpineDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return SPINE_FORMAT

    def schema(self) -> str:
        return "seq BIGINT, day DATE, dow INT, is_weekend BOOLEAN"

    def reader(self, schema) -> SpineReader:
        return SpineReader(self.options)


def register_spine_source(spark) -> None:
    """Idempotently register the format for this session."""
    try:
        spark.dataSource.register(SpineDataSource)
    except Exception:
        # already registered for this session: re-registration raises
        pass
