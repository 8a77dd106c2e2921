"""HTTP transport with the reference's retry/timeout envelope
(src/common_crawl_index.cpp:208-304, src/internet_archive.cpp:271-353):

- 5 attempts, exponential backoff 100 → 1600 ms
- retryable: HTTP 503/504, "Service Unavailable", "Gateway Timeout",
  connection errors, timeouts; non-retryable errors fail on first attempt
- a per-scan wall-clock budget (default 180 s); budget exhaustion returns an
  error string, not an exception — errors surface as row data downstream

The transport is injectable so the DataSources are hermetically testable:
tests pass a FakeTransport serving canned payloads; production uses
UrllibTransport. file:// URLs are honored by UrllibTransport too, which the
fixture-backed integration tests use.
"""

from __future__ import annotations

import time
import urllib.error
import urllib.request
from dataclasses import dataclass
from typing import Protocol

MAX_RETRIES = 5
INITIAL_BACKOFF_MS = 100
DEFAULT_TIMEOUT_SECONDS = 180
REQUEST_TIMEOUT_SECONDS = 30


class Transport(Protocol):
    def get(self, url: str, headers: dict[str, str] | None = None) -> bytes: ...

    def post(self, url: str, body: bytes, headers: dict[str, str] | None = None) -> bytes: ...


class HttpError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status


class UrllibTransport:
    """Stdlib transport; supports http(s):// and file:// URLs."""

    def __init__(self, request_timeout: float = REQUEST_TIMEOUT_SECONDS):
        self.request_timeout = request_timeout

    def get(self, url: str, headers: dict[str, str] | None = None) -> bytes:
        return self._request(url, None, headers)

    def post(self, url: str, body: bytes, headers: dict[str, str] | None = None) -> bytes:
        return self._request(url, body, headers)

    def _request(self, url: str, body: bytes | None, headers: dict[str, str] | None) -> bytes:
        req = urllib.request.Request(url, data=body, headers=headers or {})
        try:
            with urllib.request.urlopen(req, timeout=self.request_timeout) as resp:
                return resp.read()
        except urllib.error.HTTPError as exc:  # pragma: no cover - network
            raise HttpError(exc.code, f"HTTP {exc.code}: {exc.reason}") from exc
        except urllib.error.URLError as exc:  # pragma: no cover - network
            raise HttpError(0, f"connection error: {exc.reason}") from exc


class FixtureTransport:
    """Hermetic test transport: serves canned payloads from a fixture
    directory containing ``manifest.json`` mapping exact request URLs (and
    optionally ``url|Range:bytes=a-b`` keys for range requests) to relative
    file names. Picklable, so it travels to Spark python workers inside the
    DataSource reader."""

    def __init__(self, fixture_dir: str):
        self.fixture_dir = fixture_dir

    def _manifest(self) -> dict[str, str]:
        import json
        import os

        with open(os.path.join(self.fixture_dir, "manifest.json")) as f:
            return json.load(f)

    def get(self, url: str, headers: dict[str, str] | None = None) -> bytes:
        import os

        manifest = self._manifest()
        rng = (headers or {}).get("Range", "")
        key = f"{url}|Range:{rng}" if rng and f"{url}|Range:{rng}" in manifest else url
        if key not in manifest:
            raise HttpError(404, f"HTTP 404: no fixture for {key}")
        with open(os.path.join(self.fixture_dir, manifest[key]), "rb") as f:
            data = f.read()
        if rng and key == url:  # serve the byte range out of the whole file
            lo, hi = rng.removeprefix("bytes=").split("-")
            data = data[int(lo) : int(hi) + 1]
        return data

    def post(self, url: str, body: bytes, headers: dict[str, str] | None = None) -> bytes:
        # Fixtures for POST endpoints are keyed "POST <url>".
        import os

        manifest = self._manifest()
        key = f"POST {url}"
        if key not in manifest:
            raise HttpError(404, f"HTTP 404: no fixture for {key}")
        with open(os.path.join(self.fixture_dir, manifest[key]), "rb") as f:
            return f.read()


def make_transport(options: dict) -> Transport:
    """Transport factory for DataSource readers: a ``fixture_dir`` option
    selects the hermetic FixtureTransport, ``d1_sqlite_stub`` the SQLite-backed
    D1 API stub (tests only); default is UrllibTransport."""
    fixture_dir = options.get("fixture_dir")
    if fixture_dir:
        return FixtureTransport(fixture_dir)
    stub = options.get("d1_sqlite_stub")
    if stub:
        from duckdb_cloudflare_spark.util.d1_stub import D1SqliteStubTransport

        return D1SqliteStubTransport(stub)
    return UrllibTransport()


def _is_retryable(message: str) -> bool:
    m = message.lower()
    return any(
        s in m
        for s in ("503", "504", "service unavailable", "gateway timeout", "connection", "timeout")
    )


@dataclass
class FetchResult:
    body: bytes = b""
    error: str = ""


def fetch_with_retry(
    transport: Transport,
    url: str,
    headers: dict[str, str] | None = None,
    start_time: float | None = None,
    timeout_seconds: int = DEFAULT_TIMEOUT_SECONDS,
    sleep=time.sleep,
) -> FetchResult:
    """Reference retry envelope. ``start_time`` is the scan-level start
    (time.monotonic()); the wall-clock budget spans all fetches of one scan."""
    if start_time is None:
        start_time = time.monotonic()
    delay_ms = INITIAL_BACKOFF_MS
    last_error = ""
    for attempt in range(MAX_RETRIES):
        elapsed = time.monotonic() - start_time
        if elapsed >= timeout_seconds:
            return FetchResult(
                error=f"Timeout after {int(elapsed)}s (limit: {timeout_seconds}s)"
            )
        if attempt > 0:
            sleep(delay_ms / 1000.0)
            delay_ms *= 2
        try:
            return FetchResult(body=transport.get(url, headers))
        except Exception as exc:
            last_error = str(exc)
            if not _is_retryable(last_error) and attempt == 0:
                return FetchResult(error=last_error)
    return FetchResult(error=f"Failed after {MAX_RETRIES} retries: {last_error}")
