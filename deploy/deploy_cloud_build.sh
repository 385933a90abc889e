#!/usr/bin/env bash
# Cloud Build deploy: builds the image remotely and deploys to Cloud Run —
# no local Docker daemon or registry auth needed.  Bash port of the
# reference's deploy automation (reference: backend/deploy-with-cloud-build.ps1),
# same env-variable surface: GCP_PROJECT_ID, SERVICE_NAME, REGION.
#
# CPU serving deploys as-is (JAX CPU wheel in deploy/Dockerfile).  For TPU
# serving, point SERVE_ACCEL=tpu at a GKE/TPU-VM target instead of Cloud
# Run (Cloud Run has no TPUs); the script prints the matching gcloud
# commands rather than guessing at cluster specifics.

set -euo pipefail

command -v gcloud >/dev/null || {
  echo "error: gcloud not found in PATH (install the Google Cloud SDK)" >&2
  exit 1
}

PROJECT_ID="${GCP_PROJECT_ID:-$(gcloud config get-value project 2>/dev/null)}"
[ -n "$PROJECT_ID" ] && [ "$PROJECT_ID" != "(unset)" ] || {
  echo "error: no project. Set GCP_PROJECT_ID or: gcloud config set project <id>" >&2
  exit 1
}
SERVICE_NAME="${SERVICE_NAME:-vision-compression-tpu}"
REGION="${REGION:-us-central1}"
MEMORY="${MEMORY:-4Gi}"
CPUS="${CPUS:-2}"
TIMEOUT="${TIMEOUT:-300}"
CONCURRENCY="${CONCURRENCY:-8}"
IMAGE="${REGION}-docker.pkg.dev/${PROJECT_ID}/cloud-run-source-deploy/${SERVICE_NAME}"

echo "project:  $PROJECT_ID"
echo "service:  $SERVICE_NAME"
echo "region:   $REGION"
echo "image:    $IMAGE"

echo "== enabling required APIs"
gcloud services enable cloudbuild.googleapis.com run.googleapis.com \
  artifactregistry.googleapis.com --project="$PROJECT_ID"

echo "== ensuring artifact repository"
if ! gcloud artifacts repositories describe cloud-run-source-deploy \
    --location="$REGION" --project="$PROJECT_ID" >/dev/null 2>&1; then
  gcloud artifacts repositories create cloud-run-source-deploy \
    --repository-format=docker --location="$REGION" --project="$PROJECT_ID"
fi

echo "== building image with Cloud Build"
# Build from the repo root so the Dockerfile can COPY the full package.
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
gcloud builds submit "$ROOT" --tag "$IMAGE" --project="$PROJECT_ID" \
  --gcs-log-dir="gs://${PROJECT_ID}_cloudbuild/logs" 2>/dev/null ||
  gcloud builds submit "$ROOT" --tag "$IMAGE" --project="$PROJECT_ID"

if [ "${SERVE_ACCEL:-cpu}" = "tpu" ]; then
  cat <<EOF
== TPU serving target
Cloud Run cannot attach TPUs; deploy the built image to a TPU VM or GKE:
  gcloud compute tpus tpu-vm create ${SERVICE_NAME}-tpu \\
    --zone=${REGION}-a --accelerator-type=v5litepod-8 --version=tpu-ubuntu2204-base
  gcloud compute tpus tpu-vm ssh ${SERVICE_NAME}-tpu --zone=${REGION}-a \\
    --command='docker run -d --privileged --net=host ${IMAGE}'
EOF
  exit 0
fi

echo "== deploying to Cloud Run"
gcloud run deploy "$SERVICE_NAME" \
  --image "$IMAGE" \
  --platform managed \
  --region "$REGION" \
  --project "$PROJECT_ID" \
  --allow-unauthenticated \
  --memory "$MEMORY" \
  --cpu "$CPUS" \
  --timeout "$TIMEOUT" \
  --concurrency "$CONCURRENCY" \
  --port 8080

URL=$(gcloud run services describe "$SERVICE_NAME" --region "$REGION" \
  --project "$PROJECT_ID" --format 'value(status.url)')
echo "== deployed: $URL"
echo "smoke test: deploy/test_endpoint.sh $URL"
