"""The real HTTP connector: retry/backoff/fail-fast semantics of
http_get_json against the fault-injecting loopback API, and the Spark
DataSource read path end-to-end."""

from __future__ import annotations

import time
import urllib.error

import pytest

from dend_covid19_spark.sources.http_source import (
    MarketApiServer,
    http_get_json,
    series_value,
)


@pytest.fixture()
def server():
    srv = MarketApiServer(fail_first=True).start()
    yield srv
    srv.shutdown()


def _url(srv, index="IDX", date="2020-01-21"):
    return f"{srv.base_url}/api/series?index={index}&date={date}"


def test_retry_recovers_from_first_hit_503(server):
    obj = http_get_json(_url(server))
    assert obj["value"] == series_value("IDX", "2020-01-21")
    # one 503 + one 200: the retry genuinely happened
    assert server.n_requests == 2


def test_permanent_4xx_fails_fast_no_retry(server):
    with pytest.raises(urllib.error.HTTPError):
        http_get_json(f"{server.base_url}/api/nope")
    assert server.n_requests == 0  # 404 path doesn't count series hits
    before = time.monotonic()
    with pytest.raises(urllib.error.HTTPError):
        http_get_json(f"{server.base_url}/api/series")  # 400: missing params
    assert time.monotonic() - before < 0.5  # no backoff loop on 4xx


def test_retries_exhausted_raises(server):
    # a server that ALWAYS 503s: make every request look like a first
    # hit by stubbing out the seen-set, so fault injection never clears
    srv = MarketApiServer(fail_first=True).start()
    try:
        # monkeypatch: make every request look like a first hit
        srv.seen = type("S", (), {"add": lambda *a: None, "__contains__": lambda *a: False})()
        with pytest.raises(RuntimeError, match="failed after"):
            http_get_json(_url(srv), max_retries=2, backoff_s=0.01)
        assert srv.n_requests == 3  # initial + 2 retries, bounded
    finally:
        srv.shutdown()


def test_spark_read_end_to_end_counts_requests(spark, server):
    from dend_covid19_spark.sources.http_source import (
        register_http_series_source,
    )

    register_http_series_source(spark)
    indices = ["AAA", "BBBB"]
    dates = ["2020-01-21", "2020-01-22", "2020-01-23"]
    df = (
        spark.read.format("graft_http_series")
        .option("base_url", server.base_url)
        .option("indices", ",".join(indices))
        .option("dates", ",".join(dates))
        .load()
    )
    got = {(r.index_name, r.date_str, r.value) for r in df.collect()}
    assert got == {
        (ix, d, series_value(ix, d)) for ix in indices for d in dates
    }
    # every key: one injected 503 + one success — the executor-side
    # retry path ran for all six keys
    assert server.n_requests == 2 * len(indices) * len(dates)


def test_throttle_spaces_requests(server):
    """Three sequential fetches with a 60ms floor must take >= 120ms —
    the per-partition token interval is real, not decorative."""
    from dend_covid19_spark.sources.http_source import HttpSeriesReader

    reader = HttpSeriesReader(
        {
            "base_url": server.base_url,
            "indices": "IDX",
            "dates": "2020-01-21,2020-01-22,2020-01-23",
            "throttle_s": "0.06",
        }
    )
    [part] = reader.partitions()
    t0 = time.monotonic()
    rows = list(reader.read(part))
    assert len(rows) == 3
    assert time.monotonic() - t0 >= 0.12
