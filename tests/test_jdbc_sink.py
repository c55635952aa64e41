"""The embedded-Derby JDBC sink: staged two-phase promote semantics
(first load, replace load, no dirty intermediate visible under the
final name) and the partitioned read path."""

from __future__ import annotations

from dend_covid19_spark.sources.jdbc import (
    derby_url,
    read_jdbc,
    write_jdbc,
    write_jdbc_staged,
)


def test_staged_promote_first_and_replace(spark, tmp_path):
    url = derby_url(str(tmp_path / "db"))
    v1 = spark.range(5).selectExpr("id", "CAST(id * 2 AS DOUBLE) AS v")
    write_jdbc_staged(spark, v1, url, "t")
    got1 = {(r.id, r.v) for r in read_jdbc(spark, url, "t").collect()}
    assert got1 == {(i, float(i * 2)) for i in range(5)}
    # replace load: the promote must swap the table wholesale, not append
    v2 = spark.range(3).selectExpr("id", "CAST(id * 10 AS DOUBLE) AS v")
    write_jdbc_staged(spark, v2, url, "t")
    got2 = {(r.id, r.v) for r in read_jdbc(spark, url, "t").collect()}
    assert got2 == {(i, float(i * 10)) for i in range(3)}


def test_partitioned_read_matches_serial(spark, tmp_path):
    url = derby_url(str(tmp_path / "db"))
    df = spark.range(100).selectExpr("id", "CAST(id % 7 AS BIGINT) AS k")
    write_jdbc(df, url, "p")
    serial = {tuple(r) for r in read_jdbc(spark, url, "p").collect()}
    ranged = read_jdbc(
        spark, url, "p",
        partition_column="id", lower_bound="0", upper_bound="100",
        num_partitions=4,
    )
    assert ranged.rdd.getNumPartitions() == 4  # N range cursors, not 1
    assert {tuple(r) for r in ranged.collect()} == serial
