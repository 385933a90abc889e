#!/usr/bin/env bash
# Update a deployed service's runtime configuration without rebuilding —
# bash port of the reference's env-var updater
# (reference: backend/update-env-vars.ps1), carrying this framework's
# VCP_* knobs instead of cloud API keys (there are none to carry: the
# models run in-process).
#
# Usage: deploy/update_env_vars.sh KEY=VALUE [KEY=VALUE ...]
#   e.g. deploy/update_env_vars.sh VCP_MODEL_PRESET=base \
#        VCP_CHECKPOINT_DIR=/ckpt VCP_ANSWER_ENGINE=lm VCP_INDEX_SHARDED=1

set -euo pipefail

command -v gcloud >/dev/null || { echo "error: gcloud not found" >&2; exit 1; }

PROJECT_ID="${GCP_PROJECT_ID:-$(gcloud config get-value project 2>/dev/null)}"
SERVICE_NAME="${SERVICE_NAME:-vision-compression-tpu}"
REGION="${REGION:-us-central1}"

[ $# -ge 1 ] || {
  echo "usage: $0 KEY=VALUE [KEY=VALUE ...]" >&2
  echo "known knobs: VCP_MODEL_PRESET VCP_CHECKPOINT_DIR VCP_EXTRACT_ENGINE" >&2
  echo "  VCP_ANSWER_ENGINE VCP_RETRIEVAL VCP_EMBED_BACKEND VCP_EMBED_DIM" >&2
  echo "  VCP_EXTRACT_BATCH VCP_EMBED_BATCH VCP_INDEX_ROOT VCP_INDEX_SHARDED" >&2
  exit 1
}

VARS=$(IFS=, ; echo "$*")
echo "updating $SERVICE_NAME ($REGION) with: $VARS"
gcloud run services update "$SERVICE_NAME" \
  --region "$REGION" --project "$PROJECT_ID" \
  --update-env-vars "$VARS"

echo "== current env"
gcloud run services describe "$SERVICE_NAME" --region "$REGION" \
  --project "$PROJECT_ID" \
  --format 'value(spec.template.spec.containers[0].env)'
