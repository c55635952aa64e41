"""A REAL HTTP time-series connector: a Spark 4 Python DataSource whose
partitions fetch JSON over actual HTTP with retry, backoff, and
throttle — plus the deterministic in-process API server it talks to.

The reference's market source is an HTTP API pull
(/root/reference/airflow/dags/tasks/market.py:21-27 — ``quandl.get``
JSON into a DataFrame). Earlier rounds substituted a pure in-process
stand-in (plans/serving._fetch) and a file-backed Python DataSource
(sources/pyds.py) — the connector SHAPE without the wire. This module
closes that gap inside the no-external-network sandbox: a loopback
``ThreadingHTTPServer`` serves the deterministic series, and the
connector reaches it through ``urllib`` exactly as it would reach a
public API — sockets, status codes, headers and all.

What makes it production-shaped rather than a demo:
  - **Fault injection is on by default**: the server 503s the FIRST
    request for every (series, date) key (with a ``Retry-After``
    header). A connector without a working retry path CANNOT read the
    table — so the oracle-checked query row is green only because
    retry/backoff actually executed.
  - **Retry**: bounded attempts per request, exponential backoff,
    ``Retry-After`` honored when present; 4xx (except 429) fails fast
    — retrying a permanent error just burns quota.
  - **Throttle**: a minimum inter-request interval per partition
    (token-bucket with one token), because parallel partitions
    multiply request rate — at 1000 executors an unthrottled connector
    is a self-inflicted DDoS and an instant API ban.
  - **Partition planning**: one partition per series, dates batched in
    one partition's loop — the fan-out axis (few series, many dates)
    matches rate-limit domains, which are usually per-endpoint.

At 100 TB the data plane obviously isn't HTTP — but ingest control
planes are, and this is that shape: bounded parallelism, bounded rate,
fail-fast on permanent errors, retry on transient ones.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

HTTP_SERIES_FORMAT = "graft_http_series"


def series_value(index: str, date_str: str) -> float:
    """The deterministic series: day-of-month * 100 + len(index) — the
    same arithmetic as plans/serving._fetch, so oracles can restate the
    points as VALUES literals."""
    return float(int(date_str[8:10]) * 100 + len(index))


class _ApiHandler(BaseHTTPRequestHandler):
    """GET /api/series?index=<name>&date=YYYY-MM-DD ->
    {"index":..,"date":..,"value":..}; first hit per key 503s."""

    server: MarketApiServer  # type: ignore[assignment]

    def do_GET(self):  # noqa: N802 — http.server API
        q = urlparse(self.path)
        if q.path != "/api/series":
            self._send(404, {"error": "not found"})
            return
        params = parse_qs(q.query)
        try:
            index = params["index"][0]
            date_str = params["date"][0]
        except (KeyError, IndexError):
            self._send(400, {"error": "index and date required"})
            return
        srv = self.server
        with srv.lock:
            srv.n_requests += 1
            first_hit = (index, date_str) not in srv.seen
            srv.seen.add((index, date_str))
        if srv.fail_first and first_hit:
            self._send(
                503, {"error": "transient"}, headers={"Retry-After": "0.02"}
            )
            return
        self._send(
            200,
            {
                "index": index,
                "date": date_str,
                "value": series_value(index, date_str),
            },
        )

    def _send(self, code: int, obj: dict, headers: dict | None = None) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence per-request stderr noise
        pass


class MarketApiServer(ThreadingHTTPServer):
    """Loopback deterministic series API with first-hit fault injection."""

    def __init__(self, fail_first: bool = True):
        super().__init__(("127.0.0.1", 0), _ApiHandler)
        self.fail_first = fail_first
        self.lock = threading.Lock()
        self.seen: set[tuple[str, str]] = set()
        self.n_requests = 0

    @property
    def base_url(self) -> str:
        return f"http://127.0.0.1:{self.server_address[1]}"

    def start(self) -> MarketApiServer:
        threading.Thread(target=self.serve_forever, daemon=True).start()
        return self


_SERVER: dict[str, MarketApiServer] = {}
_SERVER_LOCK = threading.Lock()


def shared_server() -> MarketApiServer:
    """One server per process, started lazily (daemon thread — dies with
    the process, no cleanup protocol needed)."""
    with _SERVER_LOCK:
        srv = _SERVER.get("srv")
        if srv is None:
            srv = MarketApiServer().start()
            _SERVER["srv"] = srv
        return srv


def http_get_json(
    url: str,
    max_retries: int = 4,
    backoff_s: float = 0.05,
    timeout_s: float = 5.0,
) -> dict:
    """GET with bounded retry: exponential backoff on 5xx/429/transport
    errors, Retry-After honored, fail-fast on other 4xx. This is the
    whole transient-vs-permanent discipline a production puller needs."""
    last: Exception | None = None
    for attempt in range(max_retries + 1):
        try:
            with urllib.request.urlopen(url, timeout=timeout_s) as resp:
                return json.loads(resp.read().decode())
        except urllib.error.HTTPError as exc:
            if exc.code < 500 and exc.code != 429:
                raise  # permanent: retrying burns quota for nothing
            last = exc
            retry_after = exc.headers.get("Retry-After")
            # RFC 7231 allows Retry-After to be an HTTP-date, not just
            # delta-seconds; fall back to exponential backoff rather
            # than crashing the retry handler on a non-numeric value.
            try:
                wait = float(retry_after)
            except (TypeError, ValueError):
                wait = backoff_s * (2**attempt)
        except urllib.error.URLError as exc:
            last = exc
            wait = backoff_s * (2**attempt)
        if attempt < max_retries:
            time.sleep(wait)
    raise RuntimeError(f"GET {url} failed after {max_retries + 1} attempts: {last}")


class _SeriesPartition(InputPartition):
    def __init__(self, index: str):
        self.index = index


class HttpSeriesReader(DataSourceReader):
    def __init__(self, options):
        self.base_url = options["base_url"]
        self.indices = [s for s in options["indices"].split(",") if s]
        self.dates = [s for s in options["dates"].split(",") if s]
        self.max_retries = int(options.get("max_retries", "4"))
        self.throttle_s = float(options.get("throttle_s", "0.005"))

    def partitions(self):
        # one partition per series: matches typical per-endpoint rate
        # limit domains, and bounds total parallelism by design
        return [_SeriesPartition(ix) for ix in self.indices]

    def read(self, partition: _SeriesPartition):
        from urllib.parse import quote

        next_ok = 0.0
        for date_str in self.dates:
            now = time.monotonic()
            if now < next_ok:  # min inter-request interval per partition
                time.sleep(next_ok - now)
            next_ok = time.monotonic() + self.throttle_s
            obj = http_get_json(
                f"{self.base_url}/api/series"
                f"?index={quote(partition.index, safe='')}&date={date_str}",
                max_retries=self.max_retries,
            )
            yield (obj["index"], obj["date"], float(obj["value"]))


class HttpSeriesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return HTTP_SERIES_FORMAT

    def schema(self) -> str:
        return "index_name STRING, date_str STRING, value DOUBLE"

    def reader(self, schema) -> HttpSeriesReader:
        return HttpSeriesReader(self.options)


def register_http_series_source(spark) -> None:
    """Idempotently register the format for this session."""
    try:
        spark.dataSource.register(HttpSeriesDataSource)
    except Exception:
        pass  # already registered for this session
