#!/usr/bin/env bash
# Smoke test a deployed service (counterpart of the reference's
# backend/test-endpoint.ps1:35-81: /health, /, and a CORS preflight).
set -euo pipefail

BASE_URL="${1:-http://localhost:8080}"

echo "== GET /health"
curl -fsS "$BASE_URL/health"; echo

echo "== GET /"
curl -fsS "$BASE_URL/" | head -c 400; echo

echo "== OPTIONS /ingest (CORS preflight)"
curl -fsS -X OPTIONS -D - -o /dev/null \
    -H "Origin: http://example.com" \
    -H "Access-Control-Request-Method: POST" \
    "$BASE_URL/ingest" | grep -i "access-control"

echo "== GET /metrics"
curl -fsS "$BASE_URL/metrics" | head -c 400; echo

echo "All endpoint checks passed."
