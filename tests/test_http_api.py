"""HTTP API layer (C6) — route behavior mirrored from the reference's
tests/http_server_integration_test.rs."""

import json
import time

import pytest

from janus_spark.engine import JanusEngine
from janus_spark.http_api import HAVE_FLASK, create_app
from janus_spark.sources.melt import melt_sensor_fixture

pytestmark = pytest.mark.skipif(not HAVE_FLASK, reason="flask not available")

EX = "http://example.org/"

HIST_QUERY = f"""
PREFIX ex: <{EX}>
REGISTER RStream <out> AS
SELECT ?sensor ?temp
FROM NAMED WINDOW ex:hist ON LOG ex:sensors [START 1000 END 3000]
WHERE {{ WINDOW ex:hist {{ ?sensor ex:temperature ?temp . }} }}
"""


@pytest.fixture()
def client(spark, tmp_path):
    quads = melt_sensor_fixture(spark, 100)
    engine = JanusEngine(spark, quads)
    app = create_app(engine, buffer_root=str(tmp_path / "live"))
    app.testing = True
    return app.test_client()


def test_health_and_ops(client):
    assert client.get("/health").get_json()["status"] == "ok"
    ops = client.get("/ops/status").get_json()
    assert ops["queries"] == 0


def test_register_validates(client):
    r = client.post("/api/queries", json={})
    assert r.status_code == 400
    r = client.post("/api/queries", json={"query": "SELECT garbage FROM"})
    assert r.status_code == 400
    assert "parse error" in r.get_json()["error"]


def test_register_get_delete_lifecycle(client):
    r = client.post("/api/queries", json={"query": HIST_QUERY})
    assert r.status_code == 201
    qid = r.get_json()["query_id"]
    assert r.get_json()["status"] == "Registered"

    meta = client.get(f"/api/queries/{qid}").get_json()
    assert meta["historical_windows"] == 1 and meta["live_windows"] == 0

    listed = client.get("/api/queries").get_json()
    assert [q["query_id"] for q in listed] == [qid]

    assert client.delete(f"/api/queries/{qid}").get_json()["ok"]
    assert client.get(f"/api/queries/{qid}").status_code == 404


def test_start_and_stream_results(client):
    qid = client.post("/api/queries", json={"query": HIST_QUERY}).get_json()["query_id"]
    assert client.post(f"/api/queries/{qid}/start").get_json()["status"] == "starting"
    r = client.get(f"/api/queries/{qid}/results?timeout=60&max=1")
    lines = [json.loads(x) for x in r.data.decode().strip().splitlines() if x]
    assert len(lines) == 1
    msg = lines[0]
    assert msg["source"] == "historical"
    assert msg["type"] == "result"
    assert msg["timestamp"] == 3000  # fixed window emits ts=end
    assert len(msg["bindings"]) == 21  # inclusive bounds, ts 1000..3000
    assert {"sensor", "temp"} <= set(msg["bindings"][0].keys())

    # status flipped to Running by the background start
    for _ in range(50):
        if client.get(f"/api/queries/{qid}").get_json()["status"] == "Running":
            break
        time.sleep(0.2)
    assert client.get(f"/api/queries/{qid}").get_json()["status"] == "Running"

    stopped = client.post(f"/api/queries/{qid}/stop").get_json()
    assert stopped["status"] == "Stopped"


def test_results_timeout_empty(client):
    qid = client.post("/api/queries", json={"query": HIST_QUERY}).get_json()["query_id"]
    t0 = time.time()
    r = client.get(f"/api/queries/{qid}/results?timeout=1&max=5")
    assert time.time() - t0 < 5
    assert r.data.decode().strip() == ""


def test_replay_requires_live_query(client):
    qid = client.post("/api/queries", json={"query": HIST_QUERY}).get_json()["query_id"]
    r = client.post("/api/replay/start", json={"query_id": qid})
    assert r.status_code == 400
    r2 = client.post("/api/replay/start", json={"query_id": "nope"})
    assert r2.status_code == 400
