"""Wire-level HTTP API tests — the reference's four endpoints served
over an actual localhost listener (stdlib ThreadingHTTPServer) in
front of EventLogService, with the reference's status-code contract
(server.go:61-64, :130-327)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from vsphere_event_streaming_spark.log import EventLogService
from vsphere_event_streaming_spark.log.http_server import serve


@pytest.fixture()
def log_server(spark):
    rows = [(i, json.dumps({"id": str(i), "n": i})) for i in range(10, 130)]
    log = spark.createDataFrame(rows, "offset long, value string")
    srv = serve(EventLogService(log))
    yield srv.address
    srv.stop()


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, r.read()


def test_http_range_and_point(log_server):
    status, body = _get(log_server + "/api/v1/range")
    assert status == 200
    assert json.loads(body) == {"earliest": 10, "latest": 129}
    status, body = _get(log_server + "/api/v1/events/42")
    # stored bytes verbatim (server.go:294-295)
    assert status == 200 and body == json.dumps(
        {"id": "42", "n": 42}
    ).encode()


@pytest.mark.parametrize(
    "bad", ["abc", "1_0", "%207", "5", "999", "-3"]
)  # parse / Atoi-strict / out-of-range / future / negative → all 400
def test_http_point_error_classes_are_400(log_server, bad):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(log_server + f"/api/v1/events/{bad}")
    assert e.value.code == 400


def test_http_page_is_last_50(log_server):
    status, body = _get(log_server + "/api/v1/events")
    page = json.loads(body)
    assert status == 200 and len(page) == 50
    assert page[0]["id"] == "80" and page[-1]["id"] == "129"


def test_http_watch_replay_and_purged_start(log_server):
    status, body = _get(
        log_server + "/api/v1/events?watch=true&offset=120&max_seconds=1"
    )
    lines = [json.loads(line) for line in body.splitlines() if line.strip()]
    assert status == 200
    assert [r["id"] for r in lines] == [str(i) for i in range(120, 130)]
    # replay started at a purged offset → 400 (server.go:200-203),
    # while the page path silently skips purged offsets inside a page
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(log_server + "/api/v1/events?watch=true&offset=3")
    assert e.value.code == 400


def test_http_empty_log_204(spark):
    empty = spark.createDataFrame([], "offset long, value string")
    srv = serve(EventLogService(empty))
    try:
        for path in ("/api/v1/range", "/api/v1/events"):
            status, _ = _get(srv.address + path)
            assert status == 204
    finally:
        srv.stop()
