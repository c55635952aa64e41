"""Small-file compaction and range-clustered writes: file counts, data
parity, and the disjoint min/max ranges that make file-level pruning
work."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from dend_covid19_spark.catalog import load_table
from dend_covid19_spark.operators.maintenance import (
    cluster_by_range,
    compact_small_files,
)

from conftest import SF_DIR


def _data_files(path: str) -> list[str]:
    return sorted(
        f for f in glob.glob(f"{path}/*.parquet") if not f.startswith("_")
    )


def test_compact_small_files(spark, tmp_path):
    """64 tiny files in, few right-sized files out, same rows."""
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    orders = load_table(spark, "orders", SF_DIR)
    orders.repartition(64).write.parquet(src)
    assert len(_data_files(src)) == 64

    compact_small_files(spark, src, dst, target_file_bytes=512 * 1024)
    out_files = _data_files(dst)
    assert 1 <= len(out_files) <= 4
    assert spark.read.parquet(dst).count() == orders.count()


def test_cluster_by_range_disjoint_file_stats(spark, tmp_path):
    """Range-clustered output files own disjoint o_custkey ranges
    (footer min/max don't overlap), so a custkey predicate can skip
    every file but one."""
    dst = str(tmp_path / "clustered")
    orders = load_table(spark, "orders", SF_DIR)
    cluster_by_range(spark, orders, ["o_custkey"], dst, n_files=8)

    ranges = []
    for f in _data_files(dst):
        md = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "o_custkey"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 4
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, f"overlapping file ranges: {ranges}"
    assert spark.read.parquet(dst).count() == orders.count()


def test_clustered_scan_prunes(spark, tmp_path):
    """A selective key predicate over the clustered layout reads fewer
    rows than the table (row-group pruning visible via metrics proxy:
    the filter result is correct and the files are skippable)."""
    dst = str(tmp_path / "clustered2")
    orders = load_table(spark, "orders", SF_DIR)
    cluster_by_range(spark, orders, ["o_custkey"], dst, n_files=8)
    key = orders.agg({"o_custkey": "min"}).collect()[0][0]
    got = spark.read.parquet(dst).where(f"o_custkey = {key}").count()
    want = orders.where(f"o_custkey = {key}").count()
    assert got == want > 0
