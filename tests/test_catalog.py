"""REST connector tests against a local in-process HTTP stub.

The stub records every request so assertions cover both directions:
what the engine sent (payloads, headers, form encoding, retry counts)
and how it handled responses (pagination, 404→create, failures as
result rows, capped retry)."""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import Row

from lp_etl_plugins_spark import catalog
from lp_etl_plugins_spark.catalog import RetryPolicy

FAST_RETRY = RetryPolicy(max_attempts=3, backoff_s=0.01)


class _Stub(BaseHTTPRequestHandler):
    state: dict = {}

    def log_message(self, *args):  # silence
        pass

    def _respond(self, status: int, body):
        data = (json.dumps(body) if not isinstance(body, str) else body).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        st = _Stub.state
        url = urllib.parse.urlparse(self.path)
        q = urllib.parse.parse_qs(url.query)
        st["requests"].append(("GET", url.path, dict(q)))
        if url.path == "/api/organization_list":
            self._respond(200, {"result": list(st["orgs"])})
        elif url.path == "/api/organization_show":
            name = q["id"][0]
            self._respond(200, {"result": st["orgs"][name]})
        elif url.path == "/api/package_show":
            did = q["id"][0]
            if did in st["packages"]:
                self._respond(200, {"result": st["packages"][did]})
            else:
                self._respond(404, {"error": "not found"})
        elif url.path == "/api/package_list":
            self._respond(200, {"result": list(st["packages"])})
        elif url.path == "/api/node.json":
            page = int(q.get("page", ["0"])[0])
            size = int(q.get("pagesize", ["20"])[0])
            nodes = st["nodes"][page * size : (page + 1) * size]
            self._respond(200, nodes)
        elif url.path == "/api/flaky":
            st["flaky_hits"] += 1
            if st["flaky_hits"] < 3:
                self._respond(503, {"error": "busy"})
            else:
                self._respond(200, {"ok": True})
        else:
            self._respond(404, {"error": self.path})

    def do_POST(self):
        st = _Stub.state
        url = urllib.parse.urlparse(self.path)
        q = urllib.parse.parse_qs(url.query)
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length).decode() if length else ""
        st["requests"].append(("POST", url.path, dict(q), body, dict(self.headers)))
        if url.path == "/api/package_create":
            did = q["id"][0]
            if st.get("fail_create"):
                self._respond(500, {"error": "boom"})
            elif did in st["packages"]:
                self._respond(409, {"error": "conflict"})
            else:
                st["packages"][did] = {"name": did, "resources": []}
                self._respond(200, {"result": {"name": did}})
        elif url.path == "/api/package_update":
            did = q["id"][0]
            st["packages"][did] = json.loads(body)
            self._respond(200, {"result": {"name": did}})
        elif url.path == "/api/dataset_purge":
            did = json.loads(body)["id"]
            if st["packages"].pop(did, None) is None:
                self._respond(404, {"error": "missing"})
            else:
                self._respond(200, {"result": "purged"})
        elif url.path == "/api/node_delete":
            self._respond(200, {"result": "deleted"})
        elif url.path == "/api/services/session/token":
            self._respond(200, "tok-123")
        elif url.path == "/api/node.json":
            self._respond(200, {"nid": "new"})
        else:
            self._respond(404, {"error": self.path})


@pytest.fixture()
def stub():
    _Stub.state = {
        "requests": [],
        "orgs": {
            "acme": {"name": "acme", "extras": [{"key": "uri", "value": "https://acme.example"}]},
            "beta": {"name": "beta", "extras": [{"key": "uri", "value": "https://beta.example"}]},
        },
        "packages": {
            "existing-ds": {
                "name": "existing-ds",
                "resources": [
                    {"id": "r1", "url": "http://u1", "distro_url": "http://d1"},
                    {"id": "r2", "url": "http://u2"},
                ],
            }
        },
        "nodes": [{"nid": i} for i in range(45)],
        "flaky_hits": 0,
    }
    server = HTTPServer(("127.0.0.1", 0), _Stub)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}/api"
    server.shutdown()


def test_fetch_organizations(spark, stub):
    orgs = {r["publisher_uri"]: r["org_name"]
            for r in catalog.fetch_ckan_organizations(spark, stub, FAST_RETRY).collect()}
    assert orgs == {"https://acme.example": "acme", "https://beta.example": "beta"}


def test_paged_fetch_stops_on_empty_page(stub):
    nodes = catalog.fetch_paged_list(stub, "node.json", page_size=20, retry=FAST_RETRY)
    assert [n["nid"] for n in nodes] == list(range(45))
    pages = [r for r in _Stub.state["requests"] if r[1] == "/api/node.json"]
    assert len(pages) == 4  # 20 + 20 + 5 + the empty page that stops the loop


def test_fetch_existing_resources(spark, stub):
    ids = spark.createDataFrame([Row(dataset_id="existing-ds"), Row(dataset_id="absent")])
    got = catalog.fetch_existing_datasets(ids, stub, FAST_RETRY).collect()
    assert {(r["id"], r["url"], r["distro_url"]) for r in got} == {
        ("r1", "http://u1", "http://d1"),
        ("r2", "http://u2", None),
    }


def test_upsert_creates_then_updates(spark, stub):
    payloads = spark.createDataFrame(
        [
            Row(dataset_id="existing-ds", payload='{"name":"existing-ds","title":"E"}'),
            Row(dataset_id="new-ds", payload='{"name":"new-ds","title":"N"}'),
        ]
    )
    results = catalog.ckan_upsert(payloads, stub, "key-1", FAST_RETRY).collect()
    actions = {(r["id"], r["action"]): r["ok"] for r in results}
    assert actions == {
        ("existing-ds", "update"): True,
        ("new-ds", "create"): True,
        ("new-ds", "update"): True,
    }
    assert _Stub.state["packages"]["new-ds"]["title"] == "N"
    # API key header was sent on writes
    posts = [r for r in _Stub.state["requests"] if r[0] == "POST"]
    assert all(h.get("Authorization") == "key-1" for _, _, _, _, h in posts)


def test_ckan_purge_from_csv(spark, stub, tmp_path):
    csv = tmp_path / "ids.csv"
    csv.write_text("id,extra\nexisting-ds,x\nmissing-ds,y\n")
    results = catalog.ckan_purge(spark, stub, "key-1", csv_path=str(csv), retry=FAST_RETRY)
    got = {r["id"]: (r["ok"], r["status"]) for r in results.collect()}
    assert got == {"existing-ds": (True, 200), "missing-ds": (False, 404)}
    assert "existing-ds" not in _Stub.state["packages"]


def test_purge_fail_on_error_raises(spark, stub, tmp_path):
    csv = tmp_path / "ids.csv"
    csv.write_text("id\nmissing-1\n")
    with pytest.raises(RuntimeError, match="dataset_purge failed"):
        catalog.ckan_purge(spark, stub, "k", csv_path=str(csv),
                           fail_on_error=True, retry=FAST_RETRY)


def test_dkan_purge_and_form_post(spark, stub):
    results = catalog.dkan_purge(spark, stub, "k", retry=FAST_RETRY)
    assert results.count() == 45
    token = catalog.fetch_dkan_token(stub, FAST_RETRY)
    assert token == "tok-123"
    nodes = spark.createDataFrame(
        [Row(id="n1", form_json=json.dumps({"title": "T", "field_desc": "D & x"}))]
    )
    out = catalog.dkan_post_nodes(nodes, stub, token, FAST_RETRY).collect()
    assert out[0]["ok"]
    post = [r for r in _Stub.state["requests"]
            if r[0] == "POST" and r[1] == "/api/node.json"][-1]
    assert post[3] == "title=T&field_desc%5Bund%5D%5B0%5D%5Bvalue%5D=D+%26+x"
    headers_ci = {k.lower(): v for k, v in post[4].items()}
    assert headers_ci.get("x-csrf-token") == "tok-123"


def test_capped_retry(stub):
    status, body = catalog.http_call(
        "GET", f"{stub}/flaky", retry=RetryPolicy(max_attempts=4, backoff_s=0.01)
    )
    assert status == 200 and _Stub.state["flaky_hits"] == 3
    # and a permanently-down endpoint exhausts attempts instead of hanging
    status, _ = catalog.http_call(
        "GET", "http://127.0.0.1:1/nothing", retry=RetryPolicy(max_attempts=2, backoff_s=0.01)
    )
    assert status == 0


def test_upsert_create_failure_still_updates(spark, stub):
    """The reference swallows package_create exceptions and proceeds to
    package_update unconditionally (DcatAp11ToCkanBatch.java catch-and-
    log) — a non-200/non-409 create must not skip the update leg."""
    _Stub.state["fail_create"] = True
    payloads = spark.createDataFrame(
        [Row(dataset_id="broken-ds", payload='{"name":"broken-ds","title":"B"}')]
    )
    results = catalog.ckan_upsert(payloads, stub, "key-1", FAST_RETRY).collect()
    actions = {(r["id"], r["action"]): (r["status"], r["ok"]) for r in results}
    assert actions[("broken-ds", "create")][1] is False
    assert actions[("broken-ds", "update")] == (200, True)
    assert _Stub.state["packages"]["broken-ds"]["title"] == "B"
