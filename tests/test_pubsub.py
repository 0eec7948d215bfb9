"""Pub/Sub REST publisher (sources/pubsub.py) against an in-process HTTP
server implementing the public publish surface: emulator contract
(PUBSUB_EMULATOR_HOST, no auth), bearer-token header on the real path,
chunking to the 1000-message limit, retry on 503, hard failure on 404,
and the executor-side publish path through publish_foreach_batch."""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from cdc_rs_spark.sources.pubsub import (
    MAX_MESSAGES_PER_REQUEST,
    PubSubError,
    PubSubPublisher,
    make_pubsub_publish,
)


class FakePubSub(BaseHTTPRequestHandler):
    store: dict[str, list[bytes]] = {}
    requests: list[dict] = []
    fail_next: list[int] = []  # queue of status codes to fail with
    require_token: str | None = None

    def do_POST(self):  # noqa: N802 — http.server contract
        cls = type(self)
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        cls.requests.append(
            {
                "path": self.path,
                "auth": self.headers.get("Authorization"),
                "n": len(body.get("messages", [])),
            }
        )
        if cls.fail_next:
            code = cls.fail_next.pop(0)
            self.send_response(code)
            self.end_headers()
            self.wfile.write(b'{"error": "injected"}')
            return
        if cls.require_token is not None and (
            self.headers.get("Authorization") != f"Bearer {cls.require_token}"
        ):
            self.send_response(401)
            self.end_headers()
            self.wfile.write(b'{"error": "unauthenticated"}')
            return
        topic = self.path[len("/v1/") : -len(":publish")]
        if "missing" in topic:
            self.send_response(404)
            self.end_headers()
            self.wfile.write(b'{"error": "Topic not found"}')
            return
        msgs = body["messages"]
        ids = []
        bucket = cls.store.setdefault(topic, [])
        for m in msgs:
            bucket.append(base64.b64decode(m["data"]))
            ids.append(str(len(bucket)))
        self.send_response(200)
        self.end_headers()
        self.wfile.write(json.dumps({"messageIds": ids}).encode())

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def fake_server():
    FakePubSub.store = {}
    FakePubSub.requests = []
    FakePubSub.fail_next = []
    FakePubSub.require_token = None
    srv = ThreadingHTTPServer(("127.0.0.1", 0), FakePubSub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_emulator_contract_publish(fake_server, monkeypatch):
    """PUBSUB_EMULATOR_HOST routes to http://host with NO auth — the same
    contract Google's client libraries implement."""
    monkeypatch.setenv("PUBSUB_EMULATOR_HOST", fake_server)
    pub = PubSubPublisher()
    ids = pub.publish("projects/p/topics/t", ["a", "b", "héllo"])
    assert ids == ["1", "2", "3"]
    assert FakePubSub.store["projects/p/topics/t"] == [
        b"a", b"b", "héllo".encode(),
    ]
    assert FakePubSub.requests[0]["auth"] is None


def test_chunking_to_service_limits(fake_server, monkeypatch):
    monkeypatch.setenv("PUBSUB_EMULATOR_HOST", fake_server)
    pub = PubSubPublisher()
    n = MAX_MESSAGES_PER_REQUEST + 5
    ids = pub.publish("projects/p/topics/big", [f"m{i}" for i in range(n)])
    assert len(ids) == n
    assert [r["n"] for r in FakePubSub.requests] == [
        MAX_MESSAGES_PER_REQUEST, 5,
    ]


def test_retry_on_503_then_success(fake_server, monkeypatch):
    monkeypatch.setenv("PUBSUB_EMULATOR_HOST", fake_server)
    FakePubSub.fail_next = [503, 429]
    pub = PubSubPublisher()
    ids = pub.publish("projects/p/topics/t", ["x"])
    assert ids == ["1"] and len(FakePubSub.requests) == 3


def test_missing_topic_fails_without_retry(fake_server, monkeypatch):
    monkeypatch.setenv("PUBSUB_EMULATOR_HOST", fake_server)
    pub = PubSubPublisher()
    with pytest.raises(PubSubError, match="HTTP 404"):
        pub.publish("projects/p/topics/missing", ["x"])
    assert len(FakePubSub.requests) == 1  # 4xx (non-429) never retries


def test_bearer_token_on_real_path(fake_server, monkeypatch):
    monkeypatch.delenv("PUBSUB_EMULATOR_HOST", raising=False)
    FakePubSub.require_token = "tok123"
    pub = PubSubPublisher(
        endpoint=f"http://{fake_server}", token_provider=lambda: "tok123"
    )
    assert pub.publish("projects/p/topics/t", ["v"]) == ["1"]
    assert FakePubSub.requests[0]["auth"] == "Bearer tok123"


def test_real_endpoint_requires_credentials(monkeypatch):
    monkeypatch.delenv("PUBSUB_EMULATOR_HOST", raising=False)
    with pytest.raises(PubSubError, match="token_provider"):
        PubSubPublisher(endpoint="https://pubsub.googleapis.com")


def test_executor_side_publish_through_foreach_batch(
    spark, fake_server, monkeypatch
):
    """The full sink path: a (topic, value) frame published from the
    executors through make_pubsub_publish — one REST call per
    (partition, topic), payloads intact on the server."""
    monkeypatch.setenv("PUBSUB_EMULATOR_HOST", fake_server)
    from cdc_rs_spark.sources.sinks import publish_foreach_batch

    df = spark.createDataFrame(
        [
            ("projects/p/topics/all_pims.orders", '{"id": 1}'),
            ("projects/p/topics/all_pims.orders", '{"id": 2}'),
            ("projects/p/topics/all_pims.parts", '{"id": 3}'),
        ],
        "topic string, value string",
    )
    publish_foreach_batch(make_pubsub_publish())(df, 0)
    got = {
        t: sorted(v) for t, v in FakePubSub.store.items()
    }
    assert got == {
        "projects/p/topics/all_pims.orders": [b'{"id": 1}', b'{"id": 2}'],
        "projects/p/topics/all_pims.parts": [b'{"id": 3}'],
    }


def test_cli_pubsub_flag_publishes_for_real(fake_server, monkeypatch, tmp_path, spark):
    """`python -m cdc_rs_spark --pubsub --once` with the emulator env set:
    the drained feed's frames land on the (fake) Pub/Sub server under the
    template-derived full topic names."""
    import json as _json
    import os

    from cdc_rs_spark.__main__ import main

    monkeypatch.setenv("PUBSUB_EMULATOR_HOST", fake_server)
    src = str(tmp_path / "feed")
    os.makedirs(src)
    with open(os.path.join(src, "f.json"), "w") as f:
        f.write(_json.dumps({
            "op": "Insert", "db": "pim", "table": "product",
            "before": None, "after": {"id": 1, "x": "a"}, "ts": 10,
            "pkey": "id",
        }) + "\n")
    rc = main(
        [
            "--source", src,
            "--state", str(tmp_path / "ckpt"),
            "--topic-template", "projects/p/topics/all_pims.${table}",
            "--pubsub",
            "--once",
        ],
        spark=spark,
    )
    assert rc == 0
    msgs = FakePubSub.store.get("projects/p/topics/all_pims.product")
    assert msgs and _json.loads(msgs[0]) == {
        "id": "1", "x": "a", "_CHANGE_TYPE": "UPSERT", "tenant": "pim"
    }
