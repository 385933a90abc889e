#!/bin/bash
# Unattended curriculum babysitter: reruns scripts/run_curriculum.py with
# --resume until it reaches a terminal state (complete / out_of_budget /
# stalled) or the absolute wall deadline passes.  Exists because the TPU
# tunnel can die mid-training (round-3 incident, docs/ROUND3_STATUS.md):
# a crashed trainer must restart without a human, warm-starting from the
# stage's own partial checkpoint (run_curriculum handles that part).
#
# Usage: curriculum_supervisor.sh <end_epoch_seconds> [out_dir]
set -u
END=$1
OUT=${2:-checkpoints/r4}
cd "$(dirname "$0")/.."
while true; do
  NOW=$(date +%s)
  LEFT_H=$(python3 -c "print(max(0.0, ($END - $NOW) / 3600))")
  if python3 -c "exit(0 if $LEFT_H < 0.05 else 1)"; then
    echo "supervisor: wall deadline reached"
    break
  fi
  echo "supervisor: launching curriculum with ${LEFT_H}h budget"
  python scripts/run_curriculum.py --out "$OUT" --budget_hours "$LEFT_H" --resume
  STATUS=$(python3 -c "import json; print(json.load(open('$OUT/curriculum.json')).get('status', ''))" 2>/dev/null)
  echo "supervisor: curriculum exited, status='$STATUS'"
  case "$STATUS" in
    complete|out_of_budget|stalled*) break ;;
  esac
  sleep 20
done
echo "supervisor: done"
