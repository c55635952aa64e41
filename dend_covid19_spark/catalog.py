"""Table catalog for the driver's test data.

The reference relies on schema inference at every read
(/root/reference/airflow/dags/tasks/tweets.py:48 ``spark.read.json``). Per
SURVEY.md §1.3 the new engine pins **explicit schemas** for all curated
tables: deterministic plans, no inference scan, stable oracle hashes.

At 100 TB, explicit schemas also mean the parquet reader prunes columns
from the file footer without a sampling pass, and misdeclared files fail
fast instead of silently widening types.
"""

from __future__ import annotations

import functools
import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Explicit schemas for the 10 test tables (verified against the parquet
# footers — see /root/repo/FIXTURES.md §B). Spark reads parquet ns
# timestamps as microsecond TimestampType; int32 stays IntegerType.
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # events.ts: logical type is a plain timestamp. The driver's testdata
    # has shipped it as BOTH parquet timestamp[us] (current) and
    # TIMESTAMP(NANOS) (earlier rounds); load_table sniffs the footer and
    # picks the matching physical read path (see events_ts_is_nanos).
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = tuple(SCHEMAS)

# Physical read schema for the legacy TIMESTAMP(NANOS) layout: Spark
# rejects parquet NANOS natively ([PARQUET_TYPE_ILLEGAL]), so that layout
# is read as raw ns-longs (spark.sql.legacy.parquet.nanosAsLong) and
# converted with integer DIV (ns values ~1.7e18 overflow double's 53-bit
# mantissa — never float-divide).
EVENTS_SCHEMA_NS_LONG = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


@functools.lru_cache(maxsize=None)
def _file_ts_is_nanos(part: str) -> bool:
    """Footer-only pyarrow read (no data pages) of ONE part file; cached
    per file for the process lifetime."""
    import pyarrow.parquet as pq

    return str(pq.read_schema(part).field("ts").type) == "timestamp[ns]"


def events_ts_is_nanos(path: str, default: bool | None = None) -> bool:
    """Sniff the parquet footer: is events.ts physically TIMESTAMP(NANOS)?

    The driver has regenerated the testdata with different timestamp
    units between rounds (timestamp[ns] in r1-r2, timestamp[us] at r3+),
    so the unit must come from the file footer, never from an assumption
    — assuming ns on us data shrinks every timestamp 1000x. Accepts a
    single file or a directory of part files.

    CONTRACT: a directory holds ONE physical unit — the first part file
    speaks for all (a dir accumulating mixed-unit files across driver
    rounds is undefined; write such sources to fresh dirs). For an
    empty directory, ``default`` is returned WITHOUT caching (a
    legitimate state for a streaming source defined before its first
    file lands — the current us layout is the right default there);
    with no default it raises, the batch-read behavior."""
    target = path
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet"))) or sorted(
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        if not parts:
            if default is not None:
                return default
            raise FileNotFoundError(f"no parquet part files under {path!r}")
        target = parts[0]
    return _file_ts_is_nanos(target)


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one test table with its pinned schema.

    ``spark.read.schema(...).parquet`` skips the footer-merge schema pass
    and guarantees the declared column types (SURVEY.md §1.3 decision).
    For events, the ts physical layout is footer-sniffed (see
    events_ts_is_nanos) so either driver dataset reads correctly.
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events" and events_ts_is_nanos(path):
        # Conf is consulted at schema-conversion (planning) time, so a
        # runtime set covers reads planned after this point.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return (
            spark.read.schema(EVENTS_SCHEMA_NS_LONG)
            .parquet(path)
            .withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        )
    return spark.read.schema(SCHEMAS[name]).parquet(path)


def widen_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition a low-split scan up to executor width.

    Split sizing follows input BYTES, and parquet splits only at
    row-group boundaries — so a few-MB single-row-group file arrives as
    ONE split and any CPU-bound derivation over it (minhash/simhash
    fingerprints, per-token folds) serializes onto a single core. Call
    this before such a stage: the raw-row exchange it costs is tiny
    beside the compute it parallelizes. At real corpus size (many
    splits >= cores) the branch never fires, so nothing is shuffled at
    100 TB. Only for CPU-dense stages — byte-dense stages should keep
    their scan partitioning. Callers: operators/dedup._minhash_sigs and
    _simhash_fps (each once per (sf, data mtime, pid) behind their
    write-once parquet scratch, so the ``df.rdd`` plan-conversion cost
    of the partition probe is paid once, not per query).
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


@functools.lru_cache(maxsize=None)
def _source_bytes(path: str) -> int:
    """On-disk bytes of one table source (file or directory of parts);
    cached per path for the process lifetime — it gates a plan-shape
    decision, not a correctness one, so staleness is harmless."""
    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        return sum(
            os.path.getsize(p)
            for p in glob.glob(os.path.join(path, "**", "*"), recursive=True)
            if os.path.isfile(p)
        )
    except OSError:
        return 0


def ckpt_if_bounded(df: DataFrame, sf_dir: str, table: str = "documents") -> DataFrame:
    """Lazy lineage-truncation checkpoint, gated on SOURCE scale.

    ``localCheckpoint`` materializes the frame to the executor block
    store (disk-spillable but NOT fault-tolerant: losing an executor
    fails the job instead of recomputing). For a per-occurrence stream
    (exploded tokens/bigrams) the materialized bytes are a small
    multiple of the source table's bytes — fine while the source is
    bounded, corpus-scale storage at the 100 TB regime, where
    re-planning the explode once per consumer is the cheaper trade and
    the cluster-level answer is a maintained model table, not a
    checkpoint. The gate compares the source parquet's on-disk size
    against ``SPARK_GRAFT_CKPT_SOURCE_MAX_BYTES`` (default 2 GiB):
    below it the cut is taken (every local/bench SF qualifies, so the
    measured sharing wins stand), above it the frame is returned
    unchanged. Results are identical either way — only the plan shape
    differs."""
    limit = int(
        os.environ.get("SPARK_GRAFT_CKPT_SOURCE_MAX_BYTES", str(2 * 1024**3))
    )
    if _source_bytes(f"{sf_dir}/{table}.parquet") <= limit:
        return df.localCheckpoint(eager=False)
    return df


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every table as a temp view so ``spark.sql`` plans against
    them by name (the engine's SQL front door, S10-analog)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
