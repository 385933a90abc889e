import json
import threading
import urllib.request

import pytest

from vision_compression_project_tpu.raster import make_pdf
from vision_compression_project_tpu.serve import BatchingQueue
from vision_compression_project_tpu.serve.httpd import create_server


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    srv = create_server(host="127.0.0.1", port=0, base_tmp=tmp / "tmp")
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    # Use a small deterministic embedder for speed.
    from vision_compression_project_tpu.index import IndexStore
    from vision_compression_project_tpu.models import EmbedderConfig, HashNGramEmbedder

    srv.vcp_state._embedder = HashNGramEmbedder(
        EmbedderConfig(dim=128, ngram_buckets=2048)
    )
    srv.vcp_state._store = IndexStore(tmp / "index", dim=128)
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url) as resp:
        return resp.status, dict(resp.headers), json.loads(resp.read())


def _post_json(url, payload):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post_multipart(url, filename, filedata, fields=None):
    boundary = "testboundary123"
    parts = []
    for name, value in (fields or {}).items():
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="{name}"\r\n\r\n{value}\r\n'.encode()
        )
    parts.append(
        f'--{boundary}\r\nContent-Disposition: form-data; name="file"; '
        f'filename="{filename}"\r\nContent-Type: application/pdf\r\n\r\n'.encode()
        + filedata
        + b"\r\n"
    )
    parts.append(f"--{boundary}--\r\n".encode())
    body = b"".join(parts)
    req = urllib.request.Request(
        url,
        data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(server):
    status, headers, body = _get(server + "/health")
    assert status == 200
    assert body == {"ok": True}
    assert headers["Access-Control-Allow-Origin"] == "*"


def test_root_info(server):
    status, _, body = _get(server + "/")
    assert status == 200
    assert body["message"] == "Vision Compression Backend API"
    assert "POST /ingest" in body["endpoints"]


def test_cors_preflight(server):
    req = urllib.request.Request(server + "/ingest", method="OPTIONS")
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200
        assert resp.headers["Access-Control-Allow-Origin"] == "*"
        assert "POST" in resp.headers["Access-Control-Allow-Methods"]


def test_ingest_rejects_non_pdf(server):
    status, body = _post_multipart(server + "/ingest", "notes.txt", b"hello")
    assert status == 400
    assert body["detail"] == "File must be a PDF"


def test_ingest_then_chat_flow(server, tmp_path):
    pdf_path = make_pdf(
        [
            "Solar Energy Report\nSolar panels convert sunlight into electricity.",
            "Wind Power\nWind turbines generate power from moving air.",
        ],
        tmp_path / "doc.pdf",
    )
    status, body = _post_multipart(
        server + "/ingest", "doc.pdf", pdf_path.read_bytes(), fields={"dpi": "72"}
    )
    assert status == 200, body
    assert body["pages_total"] == 2
    assert body["pages_ingested"] == 2
    assert body["failed_pages"] == []
    doc_id = body["doc_id"]
    # doc_id format: YYYYMMDD_HHMMSS_xxxxxx
    assert len(doc_id) == 22 and doc_id[8] == "_" and doc_id[15] == "_"

    status, chat = _post_json(
        server + "/chat",
        {"doc_id": doc_id, "question": "How do solar panels work?", "top_k": 2},
    )
    assert status == 200, chat
    assert chat["doc_id"] == doc_id
    assert chat["retrieved"]
    assert chat["retrieved"][0]["page"] == 1
    assert f"({doc_id} p.1" in chat["answer_md"] or "p.1" in chat["answer_md"]


def test_chat_validation_error(server):
    status, body = _post_json(server + "/chat", {"doc_id": "x"})  # no question
    assert status == 422


def test_chat_unknown_doc(server):
    status, body = _post_json(
        server + "/chat", {"doc_id": "missing_doc", "question": "hi"}
    )
    assert status == 200
    assert body["answer_md"] == "Not found in provided pages."
    assert body["retrieved"] == []


def test_batching_queue_coalesces():
    calls = []

    def fn(batch):
        calls.append(len(batch))
        return [x * 2 for x in batch]

    bq = BatchingQueue(fn, max_batch=8, max_wait_ms=30)
    results = []
    threads = [
        threading.Thread(target=lambda v=v: results.append(bq.submit(v, timeout=5)))
        for v in range(6)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(results) == [0, 2, 4, 6, 8, 10]
    assert max(calls) > 1  # at least one coalesced batch
    bq.close()


def test_batching_queue_propagates_errors():
    def fn(batch):
        raise ValueError("boom")

    bq = BatchingQueue(fn, max_batch=4, max_wait_ms=1)
    with pytest.raises(ValueError):
        bq.submit(1, timeout=5)
    bq.close()


def test_ui_served(server):
    req = urllib.request.Request(server + "/ui")
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200
        assert "text/html" in resp.headers["Content-Type"]
        body = resp.read().decode()
    assert "Vision Compression Document QA" in body
    assert "/ingest" in body and "/chat" in body


def test_metrics_endpoint(server):
    status, _, body = _get(server + "/metrics")
    assert status == 200
    assert "timers" in body and "counters" in body


def test_fastapi_factory_gated():
    """create_app raises a clear error when fastapi is absent (this image)."""
    import pytest as _pytest

    from vision_compression_project_tpu.serve.app import create_app

    try:
        import fastapi  # noqa: F401
        _pytest.skip("fastapi installed here; gating not exercised")
    except ImportError:
        pass
    with _pytest.raises(ImportError, match="stdlib server"):
        create_app()
