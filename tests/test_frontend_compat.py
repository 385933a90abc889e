"""Frontend compatibility: the reference Next.js page's exact request
shapes must round-trip against this server.

Replays every fetch the reference UI makes
(/root/reference/frontend/app/page.tsx):
- mount-time health poll (page.tsx:46-60),
- pre-ingest health check then multipart POST /ingest whose form data
  contains ONLY a 'file' field, browser-style WebKit boundary, with an
  Origin header and no explicit Content-Type on the file part's request
  (page.tsx:68-148),
- POST /chat with {doc_id, question, top_k, max_chars_per_page}
  (page.tsx:160-171),
- the error contract the UI parses: non-ok responses carry a JSON
  {'detail': ...} body (page.tsx:109-121),
- CORS: responses must carry Access-Control-Allow-Origin for the
  cross-origin browser (reference backend main.py:35-43).

The response shapes are asserted against the UI's TypeScript interfaces
(IngestResult page.tsx:25-31, RetrievedPage page.tsx:19-23).
"""

import json
import threading
import urllib.error
import urllib.request

import pytest

from vision_compression_project_tpu.raster import make_pdf
from vision_compression_project_tpu.serve.httpd import create_server

ORIGIN = "http://localhost:3000"  # the reference frontend's dev origin


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fe_compat")
    srv = create_server(host="127.0.0.1", port=0, base_tmp=tmp / "tmp")
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    from vision_compression_project_tpu.index import IndexStore
    from vision_compression_project_tpu.models import (
        EmbedderConfig,
        HashNGramEmbedder,
    )

    srv.vcp_state._embedder = HashNGramEmbedder(
        EmbedderConfig(dim=128, ngram_buckets=2048)
    )
    srv.vcp_state._store = IndexStore(tmp / "index", dim=128)
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


@pytest.fixture(scope="module")
def pdf_bytes(tmp_path_factory):
    path = tmp_path_factory.mktemp("pdf") / "doc.pdf"
    make_pdf(
        ["First page about optical compression.", "Second page about indexes."],
        path,
    )
    return path.read_bytes()


def _request(url, method="GET", data=None, headers=None):
    req = urllib.request.Request(
        url, data=data, headers=headers or {}, method=method
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as resp:
            return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


def _browser_multipart(filename, filedata):
    """Exactly what the browser builds for `formData.append('file', file)`:
    one part named 'file', WebKit-style boundary, inferred content type
    (the UI never sets Content-Type itself, page.tsx:96)."""
    boundary = "----WebKitFormBoundary7MA4YWxkTrZu0gW"
    body = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="file"; filename="{filename}"\r\n'
        f"Content-Type: application/pdf\r\n\r\n"
    ).encode() + filedata + f"\r\n--{boundary}--\r\n".encode()
    return body, f"multipart/form-data; boundary={boundary}"


def test_health_poll(server):
    """Mount-time poll: GET /health must be response.ok with JSON."""
    status, headers, body = _request(
        f"{server}/health", headers={"Origin": ORIGIN}
    )
    assert status == 200
    assert json.loads(body) == {"ok": True}
    assert headers.get("Access-Control-Allow-Origin") == "*"


def test_ingest_chat_roundtrip(server, pdf_bytes):
    """The full UI workflow with its exact request/response shapes."""
    # 1. Pre-flight health check (page.tsx:77-84).
    status, _, _ = _request(f"{server}/health", headers={"Origin": ORIGIN})
    assert status == 200

    # 2. Multipart ingest: ONLY the 'file' field, like the browser sends.
    body, ctype = _browser_multipart("mydoc.pdf", pdf_bytes)
    status, headers, raw = _request(
        f"{server}/ingest",
        method="POST",
        data=body,
        headers={"Content-Type": ctype, "Origin": ORIGIN},
    )
    assert status == 200, raw[:500]
    assert headers.get("Access-Control-Allow-Origin") == "*"
    ingest = json.loads(raw)
    # IngestResult interface (page.tsx:25-31).
    assert set(ingest) == {
        "doc_id", "pages_total", "pages_ingested", "failed_pages",
        "manifest_path",
    }
    assert isinstance(ingest["doc_id"], str) and ingest["doc_id"]
    assert ingest["pages_total"] == 2 and ingest["pages_ingested"] == 2
    assert ingest["failed_pages"] == []

    # 3. Chat with the UI's exact JSON body (page.tsx:160-171).
    payload = {
        "doc_id": ingest["doc_id"],
        "question": "What is this about?",
        "top_k": 8,
        "max_chars_per_page": 1500,
    }
    status, headers, raw = _request(
        f"{server}/chat",
        method="POST",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json", "Origin": ORIGIN},
    )
    assert status == 200, raw[:500]
    assert headers.get("Access-Control-Allow-Origin") == "*"
    chat = json.loads(raw)
    assert isinstance(chat["answer_md"], str) and chat["answer_md"]
    # RetrievedPage interface (page.tsx:19-23): {page, memory_id, excerpt}.
    assert chat["retrieved"], "evidence panel would be empty"
    for item in chat["retrieved"]:
        assert set(item) == {"page", "memory_id", "excerpt"}
        assert isinstance(item["page"], int)
        assert isinstance(item["memory_id"], str)
        assert len(item["excerpt"]) <= 250


def test_chat_preflight_cors(server):
    """A cross-origin JSON POST triggers a browser preflight; the reference
    backend answers it via CORSMiddleware (main.py:35-43)."""
    status, headers, _ = _request(
        f"{server}/chat",
        method="OPTIONS",
        headers={
            "Origin": ORIGIN,
            "Access-Control-Request-Method": "POST",
            "Access-Control-Request-Headers": "content-type",
        },
    )
    assert status in (200, 204)
    assert headers.get("Access-Control-Allow-Origin") == "*"
    assert "POST" in headers.get("Access-Control-Allow-Methods", "")
    allow_headers = headers.get("Access-Control-Allow-Headers", "").lower()
    assert allow_headers == "*" or "content-type" in allow_headers


def test_error_detail_contract(server):
    """The UI surfaces errorJson.detail from non-ok responses
    (page.tsx:109-121); error bodies must be JSON with a 'detail' key."""
    body, ctype = _browser_multipart("notes.txt", b"plain text, not a pdf")
    status, _, raw = _request(
        f"{server}/ingest",
        method="POST",
        data=body,
        headers={"Content-Type": ctype, "Origin": ORIGIN},
    )
    assert status == 400
    assert "detail" in json.loads(raw)


def test_ui_shows_failed_pages(server):
    """The built-in /ui must carry the reference ingest card's failed-page
    list (page.tsx:259-283) and the health/evidence panels."""
    status, _, raw = _request(f"{server}/ui")
    assert status == 200
    html = raw.decode()
    assert "Failed pages" in html
    assert "failed_pages.map" in html
    assert "/health" in html and "/ingest" in html and "/chat" in html
