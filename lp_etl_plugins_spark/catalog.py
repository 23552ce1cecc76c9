"""External catalog connectors: REST sources/sinks + purge pipelines.

Re-expresses the reference's HTTP surface (SURVEY §2.1 S5, S9-S11 and
§2.8 ckan_purge/dkan_purge) Spark-first:

- catalog *state* (organization maps, dataset lists, node pages) is
  small — fetched with a driver-side paged loop (S5) and broadcast,
  exactly the locality the reference uses
  (DcatAp11ToCkanBatch.java:84-154, DcatAp11ToDkanBatch.java:78-152,
  DkanPurger.java:98-139);
- per-dataset *writes* (upsert/delete/form-post) run distributed via
  ``mapPartitions`` — each partition opens one session worth of HTTP
  calls and yields a result row per item, so failures become a result
  DataFrame instead of a crashed job (CkanPurger.java:134-140's
  failOnError semantics);
- every call uses CAPPED exponential-backoff retry. The reference
  retries FOREVER on no-response (``do {} while(!responded)``,
  DcatAp11ToDkanBatch.java:269-294) — deliberately not reproduced; an
  engine that can hang a 1000-executor stage on one dead endpoint is
  broken at scale.

No API schema is invented: request/response shapes mirror
CkanManager.java:39-101 (package_list / dataset_purge /
organization_purge), DcatAp11ToCkanBatch.java:164-251,522-606
(organization_list+show, package_show/create/update) and
DcatAp11ToDkanBatch.java:156-197,519-619 (CSRF token, Drupal
``field_x[und][0][value]`` form encoding).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RetryPolicy:
    """Capped exponential backoff (the engine's replacement for the
    reference's unbounded retry loop)."""

    max_attempts: int = 4
    backoff_s: float = 0.2
    retry_statuses: tuple[int, ...] = (429, 500, 502, 503, 504)


DEFAULT_RETRY = RetryPolicy()


def http_call(
    method: str,
    url: str,
    headers: dict[str, str] | None = None,
    data: bytes | None = None,
    retry: RetryPolicy = DEFAULT_RETRY,
    timeout_s: float = 10.0,
) -> tuple[int, str]:
    """One HTTP call with capped retry → (status, body). Network errors
    count as attempts; the final failure returns status 0."""
    last_status, last_body = 0, ""
    for attempt in range(retry.max_attempts):
        try:
            req = urllib.request.Request(url, data=data, method=method)
            for k, v in (headers or {}).items():
                req.add_header(k, v)
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                status = resp.status
                body = resp.read().decode("utf-8", errors="replace")
        except urllib.error.HTTPError as exc:
            status = exc.code
            body = exc.read().decode("utf-8", errors="replace")
        except Exception as exc:  # connection refused / timeout / DNS
            status, body = 0, repr(exc)
        last_status, last_body = status, body
        if status != 0 and status not in retry.retry_statuses:
            return status, body
        if attempt < retry.max_attempts - 1:
            time.sleep(retry.backoff_s * (2**attempt))
    return last_status, last_body


# ---------------------------------------------------------------------------
# S2 — single-column CSV id source (CsvReader.java:17-39)
# ---------------------------------------------------------------------------


def read_id_column(spark: SparkSession, path: str, column_index: int = 0) -> DataFrame:
    """First (or n-th) column of a headered CSV → one-column DataFrame
    ``id`` (the purge pipelines' file-driven input)."""
    df = spark.read.option("header", True).csv(path)
    return df.select(F.col(df.columns[column_index]).cast("string").alias("id"))


# ---------------------------------------------------------------------------
# S5 — paged REST JSON sources (driver-side; catalog state is small)
# ---------------------------------------------------------------------------


def fetch_ckan_organizations(
    spark: SparkSession, api_uri: str, retry: RetryPolicy = DEFAULT_RETRY
) -> DataFrame:
    """organization_list → organization_show per org; the extras row
    with key 'uri' maps publisher URI → org name, last-wins
    (DcatAp11ToCkanBatch.java:84-154). → (publisher_uri, org_name)."""
    status, body = http_call("GET", f"{api_uri}/organization_list", retry=retry)
    if status != 200:
        raise RuntimeError(f"organization_list failed: {status} {body[:200]}")
    names = json.loads(body)["result"]
    mapping: dict[str, str] = {}
    for name in names:
        s2, b2 = http_call(
            "GET", f"{api_uri}/organization_show?id={urllib.parse.quote(name)}", retry=retry
        )
        if s2 != 200:
            continue
        result = json.loads(b2)["result"]
        for extra in result.get("extras", []):
            if extra.get("key") == "uri":
                mapping[extra["value"]] = name  # put() last-wins (:132)
    rows = [Row(publisher_uri=k, org_name=v) for k, v in mapping.items()]
    return spark.createDataFrame(rows, "publisher_uri string, org_name string")


def fetch_paged_list(
    api_uri: str,
    path: str,
    page_size: int = 20,
    page_param: str = "page",
    size_param: str = "pagesize",
    retry: RetryPolicy = DEFAULT_RETRY,
) -> list[dict]:
    """DKAN-style pagination: ?pagesize=N&page=K until an empty page
    (DcatAp11ToDkanBatch.java:78-152, page size 20 at :67)."""
    out: list[dict] = []
    page = 0
    while True:
        url = f"{api_uri}/{path}?{size_param}={page_size}&{page_param}={page}"
        status, body = http_call("GET", url, retry=retry)
        if status != 200:
            raise RuntimeError(f"paged fetch failed: {status} {body[:200]}")
        items = json.loads(body)
        if not items:
            return out
        out.extend(items)
        page += 1


def fetch_existing_datasets(
    ids: DataFrame, api_uri: str, retry: RetryPolicy = DEFAULT_RETRY
) -> DataFrame:
    """package_show sweep over dataset ids (the reference queries one
    dataset at a time inside its loop, :213-251) — distributed via
    mapPartitions, one row per live resource:
    (dataset_id, id, url, distro_url, raw_json)."""

    def run(rows: Iterator[Row]) -> Iterator[Row]:
        for r in rows:
            did = r["dataset_id"]
            status, body = http_call(
                "GET", f"{api_uri}/package_show?id={urllib.parse.quote(did)}", retry=retry
            )
            if status != 200:
                continue
            result = json.loads(body)["result"]
            for res in result.get("resources", []):
                yield Row(
                    dataset_id=did,
                    id=res.get("id"),
                    url=res.get("url"),
                    distro_url=res.get("distro_url"),
                    raw_json=json.dumps(res, separators=(",", ":"), sort_keys=True),
                )

    schema = "dataset_id string, id string, url string, distro_url string, raw_json string"
    # materialized, not a lazy plan: the result feeds BOTH branches of
    # the diff/merge (merged + preserved), and a lazy mapPartitions
    # would re-issue the full GET sweep once per consumer — two sweeps
    # can also see different catalog states, making the branches
    # mutually inconsistent. Catalog-sized, so driver materialization
    # is the same locality call _run_once documents.
    rows = ids.select("dataset_id").distinct().rdd.mapPartitions(run).collect()
    return ids.sparkSession.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# S9 — CKAN upsert sink (package_create if absent + package_update)
# ---------------------------------------------------------------------------

_RESULT_SCHEMA = "id string, action string, status int, ok boolean, detail string"


def _run_once(source: DataFrame, run) -> DataFrame:
    """Execute a side-effecting HTTP sweep EXACTLY once and return a
    re-execution-proof result DataFrame. A lazily-returned mapPartitions
    plan re-runs every POST each time the caller takes an action on it
    (and a cached plan can be evicted and silently re-POST — the second
    sweep then 404s on already-purged ids). Result sets are catalog-
    sized (one row per HTTP call), so driver materialization is safe —
    the same locality call the reference makes by looping on the driver."""
    rows = source.rdd.mapPartitions(run).collect()
    return source.sparkSession.createDataFrame(rows, _RESULT_SCHEMA)


def ckan_upsert(
    payloads: DataFrame,
    api_uri: str,
    api_key: str,
    retry: RetryPolicy = DEFAULT_RETRY,
) -> DataFrame:
    """Distributed idempotent upsert (DcatAp11ToCkanBatch.java:522-606):
    package_show → package_create when missing → package_update with the
    full payload. 409 on create is a conflict error (:545-548). Input:
    (dataset_id, payload); output: one result row per HTTP action."""

    def run(rows: Iterator[Row]) -> Iterator[Row]:
        headers = {"Authorization": api_key, "Content-Type": "application/json"}
        for r in rows:
            did, payload = r["dataset_id"], r["payload"]
            status, _ = http_call(
                "GET", f"{api_uri}/package_show?id={urllib.parse.quote(did)}", retry=retry
            )
            exists = status == 200
            quoted = urllib.parse.quote(did)
            if not exists:
                body = json.dumps({"name": did}).encode()
                s, b = http_call(
                    "POST", f"{api_uri}/package_create?id={quoted}", headers, body, retry
                )
                yield Row(id=did, action="create", status=s, ok=s == 200, detail=b[:200])
                # ANY create failure falls through to package_update:
                # the reference swallows create exceptions (catch-and-
                # log, DcatAp11ToCkanBatch.java:552-556) and proceeds,
                # so this run's metadata is still pushed — a 409 means
                # the dataset exists after all (package_show can fail
                # transiently and read as 'missing'), and other errors
                # leave the update as the best-effort recovery; the
                # create's failure status stays visible in its result
                # row either way.
            s, b = http_call(
                "POST", f"{api_uri}/package_update?id={quoted}", headers, payload.encode(), retry
            )
            yield Row(id=did, action="update", status=s, ok=s == 200, detail=b[:200])

    return _run_once(payloads.select("dataset_id", "payload"), run)


# ---------------------------------------------------------------------------
# S10 — REST delete sink + §2.8 purge pipelines
# ---------------------------------------------------------------------------


def rest_delete(
    ids: DataFrame,
    api_uri: str,
    api_key: str,
    action: str = "dataset_purge",
    fail_on_error: bool = False,
    retry: RetryPolicy = DEFAULT_RETRY,
) -> DataFrame:
    """POST ``{action}`` with ``{"id": x}`` per id (CkanManager.java:
    49-71,83-101) via mapPartitions; failures surface as result rows
    (failOnError=False, CkanPurger.java:134-140) or raise after the
    sweep when ``fail_on_error``."""

    def run(rows: Iterator[Row]) -> Iterator[Row]:
        headers = {"Authorization": api_key, "Content-Type": "application/json"}
        for r in rows:
            body = json.dumps({"id": r["id"]}).encode()
            s, b = http_call("POST", f"{api_uri}/{action}", headers, body, retry)
            yield Row(id=r["id"], action=action, status=s, ok=s == 200, detail=b[:200])

    results = _run_once(ids.select("id"), run)
    if fail_on_error:
        failed = results.filter(~F.col("ok")).limit(1).collect()
        if failed:
            raise RuntimeError(f"{action} failed for id={failed[0]['id']}: {failed[0]['detail']}")
    return results


def ckan_purge(
    spark: SparkSession,
    api_uri: str,
    api_key: str,
    csv_path: str | None = None,
    fail_on_error: bool = False,
    retry: RetryPolicy = DEFAULT_RETRY,
) -> DataFrame:
    """§2.8 ckan_purge (CkanPurger.java:36-54): ids from a CSV column
    (S2) or the live package_list, then bulk dataset_purge."""
    if csv_path is not None:
        ids = read_id_column(spark, csv_path)
    else:
        status, body = http_call("GET", f"{api_uri}/package_list", retry=retry)
        if status != 200:
            raise RuntimeError(f"package_list failed: {status}")
        ids = spark.createDataFrame(
            [Row(id=i) for i in json.loads(body)["result"]], "id string"
        )
    return rest_delete(ids, api_uri, api_key, "dataset_purge", fail_on_error, retry)


def dkan_purge(
    spark: SparkSession,
    api_uri: str,
    api_key: str,
    fail_on_error: bool = False,
    retry: RetryPolicy = DEFAULT_RETRY,
) -> DataFrame:
    """§2.8 dkan_purge (DkanPurger.java:98-139,169-206): paged node
    enumeration, then per-node delete."""
    nodes = fetch_paged_list(api_uri, "node.json", retry=retry)
    ids = spark.createDataFrame(
        [Row(id=str(n["nid"])) for n in nodes] or [], "id string"
    )
    return rest_delete(ids, api_uri, api_key, "node_delete", fail_on_error, retry)


# ---------------------------------------------------------------------------
# S11 — DKAN form-encoded sink (Drupal field encoding + CSRF token)
# ---------------------------------------------------------------------------


def dkan_form_encode(fields: dict[str, str]) -> str:
    """Drupal node form encoding (DcatAp11ToDkanBatch.java:519-575):
    bare ``field_*`` keys wrap as ``field_x[und][0][value]``; keys that
    already carry a Drupal path (contain ``[``, e.g. the output of
    ``dcat.build_dkan_fields``) pass through unchanged."""
    enc: dict[str, str] = {}
    for k, v in fields.items():
        key = f"{k}[und][0][value]" if k.startswith("field_") and "[" not in k else k
        enc[key] = v
    return urllib.parse.urlencode(enc)


def fetch_dkan_token(api_uri: str, retry: RetryPolicy = DEFAULT_RETRY) -> str:
    """CSRF token for DKAN posts (DcatAp11ToDkanBatch.java:156-197)."""
    status, body = http_call("POST", f"{api_uri}/services/session/token", retry=retry)
    if status != 200:
        raise RuntimeError(f"token fetch failed: {status}")
    return body.strip()


def dkan_post_nodes(
    nodes: DataFrame,
    api_uri: str,
    token: str,
    retry: RetryPolicy = DEFAULT_RETRY,
) -> DataFrame:
    """Form-encoded node POSTs with the CSRF token header, capped retry
    (the reference's infinite ``do{}while(!responded)`` is replaced by
    the RetryPolicy). Input: (id, form_json) where form_json is a flat
    string→string JSON object of Drupal fields."""

    def run(rows: Iterator[Row]) -> Iterator[Row]:
        headers = {
            "X-CSRF-Token": token,
            "Content-Type": "application/x-www-form-urlencoded",
        }
        for r in rows:
            body = dkan_form_encode(json.loads(r["form_json"])).encode()
            s, b = http_call("POST", f"{api_uri}/node.json", headers, body, retry)
            yield Row(id=r["id"], action="node_post", status=s, ok=s == 200, detail=b[:200])

    return _run_once(nodes.select("id", "form_json"), run)
