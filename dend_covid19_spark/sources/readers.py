"""Source/sink surface (SURVEY.md §2.1 S1-S11), Spark-first.

The reference's sources are gzipped JSONL globs, a one-row JSONL hand-off,
an HTTP time series, and Redshift INSERT/COPY sinks. The engine's
equivalents, each designed for distributed execution:

  read_jsonl          S1/S3: JSON datasource with explicit-or-inferred
                      schema (explicit preferred — no sampling scan)
  read_partitioned    S2: Hive-partitioned parquet + partition-pruning
                      filter (replaces path templating)
  from_rows           S5: createDataFrame with explicit schema
  write_jsonl         S6: JSON sink (overwrite)
  write_partitioned   S7/S8 analog: partitioned parquet sink — the
                      distributed replacement for row INSERTs and COPY
  external_timeseries S4 shape: a connector callback materialized to a
                      DataFrame (driver fetch is fine — the series is
                      tiny; the *data* never loops through the driver)
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """S1/S3: JSONL read. With ``schema`` Spark skips the inference pass
    (the reference's double-read at tweets.py:48 — SURVEY.md §4.2)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str | None = None
) -> None:
    """S6: JSONL sink (tweets.py:82 analog). ``compression='gzip'``
    writes the reference's ``*.jsonl.gz`` shard layout (tweets.py:44)."""
    writer = df.write.mode(mode)
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Iterable[str], mode: str = "overwrite"
) -> None:
    """S7/S8 analog: partitioned parquet sink. Replaces both the row-at-a-
    time INSERT loop (market.py:29-42) and the COPY path (tweets.py:85-101)
    with a distributed write; downstream reads get partition pruning."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(
    spark: SparkSession, path: str, schema: StructType | None = None, **eq_filters
) -> DataFrame:
    """S2: partition-pruned read. ``eq_filters`` become equality
    predicates on partition columns — Catalyst prunes directories at
    planning time, the moral equivalent of the reference's
    '{y}/{m}/{d}/*.jsonl.gz' path templating (tweets.py:41-45) without
    hand-built paths."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    for col, val in eq_filters.items():
        df = df.where(F.col(col) == F.lit(val))
    return df


def read_table_auto(spark: SparkSession, path: str, **eq_filters) -> DataFrame:
    """One reader across BOTH table layouts (the convergence design's
    migration shim, operators/lakehouse.py module docstring item 4):
    if ``path`` carries a manifest log (``_manifests/``), plan from the
    pinned current manifest — no directory listing, concurrent
    maintenance invisible, equality filters pruned via the manifest's
    per-file stats (files_for_values); otherwise fall back to the
    hive-layout ``read_partitioned`` where Catalyst prunes directories.
    Callers migrate a table from directory-swap to manifest-commit
    maintenance without a code change on the read side.

    Single-value stats pruning is exact for a clustered layout and
    sound for any other (missing/wide stats widen); the exact predicate
    is still applied on top on both branches.

    The manifest branch reads with mergeSchema: appends may have EVOLVED
    the schema (a column present only in newer files), and a
    single-footer read would silently drop it — the same lossy hazard
    compact_manifest_table closes the same way. Footer-only cost per
    planned file, driver metadata. A fully-pruned plan returns an empty
    DataFrame carrying the FULL table schema (mergeSchema over every
    file under limit(0)); an empty manifest fails loudly like
    read_manifest_table does, instead of handing Spark a path-less
    read."""
    import os as _os

    if not _os.path.isdir(_os.path.join(path, "_manifests")):
        return read_partitioned(spark, path, **eq_filters)

    from ..operators.lakehouse import current_manifest, files_for_values

    m = current_manifest(path)
    if not m["files"]:
        raise FileNotFoundError(
            f"manifest v{m['version']} references no files under {path}"
        )
    files = m["files"]
    for col, val in eq_filters.items():
        keep = set(files_for_values({**m, "files": files}, col, [val]))
        files = [f for f in files if f in keep]
    reader = spark.read.option("mergeSchema", "true")
    df = (
        reader.parquet(*[_os.path.join(path, f) for f in files])
        if files
        else reader.parquet(*[_os.path.join(path, f) for f in m["files"]]).limit(0)
    )
    for col, val in eq_filters.items():
        df = df.where(F.col(col) == F.lit(val))
    return df


# RFC-4180 quoting, pinned identically on both CSV sides: quotes escape
# by doubling, so text containing quotes/commas/newlines survives the
# round trip with any standards-compliant third party.
_CSV_OPTS = {"quote": '"', "escape": '"'}


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV read with an explicit schema (inferSchema would add a full
    extra pass over the data — never in production paths).

    ``multiLine`` is on so quoted fields containing embedded newlines
    parse as one record instead of splitting mid-row. Scale note:
    multiLine makes each FILE a parse unit (no intra-file split), so
    parallelism comes from shard count — which is how the distributed
    writer lays CSV out anyway; for huge single-file CSVs, pre-split or
    convert to parquet at the edge."""
    reader = spark.read.option("header", str(header).lower()).option(
        "multiLine", "true"
    )
    for k, v in _CSV_OPTS.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink with header (interchange format; parquet is the default
    for anything read back by the engine). Quoting pinned to RFC-4180
    doubling to match ``read_csv`` — see _CSV_OPTS."""
    writer = df.write.mode(mode).option("header", "true")
    for k, v in _CSV_OPTS.items():
        writer = writer.option(k, v)
    writer.csv(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """ORC read — same columnar footing as parquet (predicate pushdown,
    column pruning, vectorized reader) for lakes standardized on ORC."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (interchange with Hive/Trino ORC-first warehouses)."""
    df.write.mode(mode).orc(path)


def from_rows(spark: SparkSession, rows: list, schema: StructType | str) -> DataFrame:
    """S5: in-memory rows -> DataFrame with explicit schema
    (tweets.py:81 without dict-shape inference)."""
    return spark.createDataFrame(rows, schema)


def external_timeseries(
    spark: SparkSession,
    fetch: Callable[[str, str], list],
    keys: Iterable[str],
    date: str,
    schema: StructType | str = "date date, series string, value double",
) -> DataFrame:
    """S4 shape: pull (date, key)->value points from an external API
    callback and materialize one DataFrame for a single batched write —
    versus the reference's one-INSERT-per-index loop (market.py:29-42).
    Missing points surface as NULL values (market.py:26-27 semantics
    belong to the callback)."""
    rows = []
    for key in keys:
        rows.extend(fetch(key, date))
    return spark.createDataFrame(rows, schema)
