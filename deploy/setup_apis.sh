#!/usr/bin/env bash
# One-time project setup: enable every API the deploy path needs and verify
# they respond — bash port of the reference's setup/quick-fix scripts
# (reference: backend/setup-apis.ps1, backend/quick-fix-apis.ps1).

set -euo pipefail

command -v gcloud >/dev/null || { echo "error: gcloud not found" >&2; exit 1; }
PROJECT_ID="${GCP_PROJECT_ID:-$(gcloud config get-value project 2>/dev/null)}"
[ -n "$PROJECT_ID" ] && [ "$PROJECT_ID" != "(unset)" ] || {
  echo "error: set GCP_PROJECT_ID or gcloud config set project <id>" >&2
  exit 1
}

APIS=(
  cloudbuild.googleapis.com
  run.googleapis.com
  artifactregistry.googleapis.com
  logging.googleapis.com
  tpu.googleapis.com          # TPU VM serving target
)

for api in "${APIS[@]}"; do
  echo "enabling $api"
  gcloud services enable "$api" --project="$PROJECT_ID"
done

echo "== verifying"
for api in "${APIS[@]}"; do
  if gcloud services list --enabled --project="$PROJECT_ID" \
      --filter="config.name=$api" --format='value(config.name)' | grep -q .; then
    echo "ok: $api"
  else
    echo "MISSING: $api (propagation can take ~1 min; re-run to verify)"
  fi
done
