"""Source/sink round-trips (S1-S11) + multimodal plumbing unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dend_covid19_spark.catalog import load_table
from dend_covid19_spark.multimodal.binary_ops import (
    _decode_stub,
    attach_binary_payload,
    extract_binary_meta,
)
from dend_covid19_spark.plans.cdc import merge_upsert
from dend_covid19_spark.sources.readers import (
    from_rows,
    read_csv,
    read_jsonl,
    read_orc,
    read_partitioned,
    write_csv,
    write_jsonl,
    write_orc,
    write_partitioned,
)
from tests.conftest import SF_DIR


def test_jsonl_roundtrip(spark, tmp_path):
    docs = load_table(spark, "documents", SF_DIR).limit(50)
    path = str(tmp_path / "docs_json")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, schema="doc_id long, lang string, text string")
    assert back.count() == 50
    assert set(back.columns) == {"doc_id", "lang", "text"}


def test_partitioned_write_prunes(spark, tmp_path):
    ev = load_table(spark, "events", SF_DIR).withColumn("day", F.to_date("ts"))
    path = str(tmp_path / "events_by_day")
    write_partitioned(ev, path, ["day"])
    one_day = read_partitioned(spark, path, day="2024-01-05")
    assert one_day.count() > 0
    # partition pruning must reach the physical scan
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or one_day.count() < ev.count()


def test_csv_roundtrip(spark, tmp_path):
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "lang").limit(40)
    path = str(tmp_path / "docs_csv")
    write_csv(docs, path)
    back = read_csv(spark, path, schema="doc_id long, lang string")
    assert back.count() == 40
    assert back.schema["doc_id"].dataType.typeName() == "long"


def test_orc_roundtrip_pushdown(spark, tmp_path):
    """ORC round-trips with schema intact and a key predicate reaches
    the ORC scan as a pushed filter (columnar parity with parquet)."""
    orders = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert back.count() == orders.count()
    assert back.schema["o_totalprice"].dataType == orders.schema["o_totalprice"].dataType
    filtered = back.where(F.col("o_orderstatus") == "F")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan.split("PushedFilters:")[1][:200]
    assert filtered.count() == orders.where("o_orderstatus = 'F'").count()


def test_merge_upsert(spark):
    current = from_rows(
        spark,
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)],
        "id long, v string, ts long",
    )
    updates = from_rows(
        spark,
        [(2, "b2", 11), (2, "b3", 12), (4, "d", 11)],
        "id long, v string, ts long",
    )
    out = {r.id: (r.v, r.ts) for r in merge_upsert(current, updates, "id", "ts").collect()}
    # key 1,3 untouched; key 2 takes the latest update; key 4 inserted
    assert out == {1: ("a", 10), 2: ("b3", 12), 3: ("c", 10), 4: ("d", 11)}


def test_from_rows(spark):
    df = from_rows(spark, [(1, "a"), (2, "b")], "id long, v string")
    assert df.count() == 2 and df.schema["id"].dataType.typeName() == "long"


def test_decode_stub_contract():
    meta = _decode_stub(b"abc")
    assert meta == {
        "byte_len": 3,
        "first_byte": 97,
        "content_md5": "900150983cd24fb0d6963f7d28e17f72",
    }
    with pytest.raises(NotImplementedError):
        _decode_stub(None)


def test_multimodal_batch_shapes(spark):
    docs = load_table(spark, "documents", SF_DIR).limit(10)
    out = extract_binary_meta(attach_binary_payload(docs))
    rows = out.collect()
    assert len(rows) == 10
    assert all(r.byte_len > 0 and len(r.content_md5) == 32 for r in rows)


def test_configure_object_store_sets_hadoop_conf(spark):
    from dend_covid19_spark.session import configure_object_store

    configure_object_store(
        spark,
        endpoint="http://localhost:9000",
        access_key="ak",
        secret_key="sk",
        path_style_access=True,
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == "http://localhost:9000"
    assert hconf.get("fs.s3a.access.key") == "ak"
    assert hconf.get("fs.s3a.path.style.access") == "true"
    assert hconf.get("fs.s3a.committer.name") == "magic"


def test_python_datasource_partitions_disjoint_complete(spark):
    """The custom Python DataSource must fan its read across partitions
    that tile the seq range exactly (no dropped or duplicated rows),
    and re-registering the format must be a no-op, not an error."""
    from pyspark.sql import functions as F

    from dend_covid19_spark.sources.pyds import (
        SPINE_FORMAT,
        register_spine_source,
    )

    register_spine_source(spark)
    register_spine_source(spark)  # idempotent
    df = (
        spark.read.format(SPINE_FORMAT)
        .option("start", "2000-01-01")
        .option("days", 100)
        .option("numPartitions", 7)
        .load()
    )
    assert df.rdd.getNumPartitions() == 7  # ceil(100/15)... planner-set fan-out
    rows = df.select("seq", "day", "dow", "is_weekend").collect()
    seqs = sorted(r.seq for r in rows)
    assert seqs == list(range(100))
    by_seq = {r.seq: r for r in rows}
    import datetime

    assert by_seq[0].day == datetime.date(2000, 1, 1)
    assert by_seq[99].day == datetime.date(2000, 4, 9)
    assert all(r.dow == r.seq % 7 for r in rows)
    assert all(r.is_weekend == (r.dow in (5, 6)) for r in rows)
    # partition count stat: 7 requested -> ceil-split keeps every task
    # non-empty except possibly the last
    sizes = [
        r.n for r in df.groupBy(F.spark_partition_id().alias("p")).agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    ]
    assert sum(sizes) == 100 and len(sizes) == 7
