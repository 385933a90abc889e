#!/usr/bin/env bash
# Tail service logs (counterpart of the reference's check-logs.ps1, which
# tailed Cloud Run revisions).  Works for the docker and systemd deployments
# described in deploy/README.md.
set -euo pipefail

TARGET="${1:-docker}"
LINES="${2:-100}"

case "$TARGET" in
  docker)
    exec docker logs --tail "$LINES" -f "$(docker ps -qf ancestor=vcp-tpu | head -1)"
    ;;
  systemd)
    exec journalctl -u vcp-tpu -n "$LINES" -f
    ;;
  file)
    exec tail -n "$LINES" -f "${3:-/var/log/vcp-tpu.log}"
    ;;
  *)
    echo "usage: $0 [docker|systemd|file] [lines] [path]" >&2
    exit 1
    ;;
esac
