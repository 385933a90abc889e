#!/bin/bash
# Round-5 unattended training pilot (supersedes scripts/round4_pilot.sh).
#
# Same skeleton as round 4 — probe the tunnel before every phase, run each
# workload in its own process group under a staleness watchdog, keep all
# state restart-safe — plus the round-4 verdict/advice fixes:
#
#   * chip-lock aware (scripts/chip_lock.py): every chip workload registers
#     its PGID; bench.py's supervisor preempts the lock at round end, and
#     the pilot stays off the chip while anything else holds the lock.
#   * CPU chores while the tunnel is down (VERDICT r4 weak 6): instead of
#     sleeping between probes, runs marker-gated host-side work (engine
#     build, fast test lane).
#   * eval gates only ship on evals that exited 0 AND produced their JSON
#     (ADVICE r4 #2; the curriculum driver now exits eval_failed:* for a
#     clean supervisor retry instead of re-burning stage training).
#   * git commits are restricted to the given paths (ADVICE r4 #5).
#
# Phases (state under checkpoints/r4/curr — CONTINUES the round-4
# curriculum in place — and checkpoints/r5/ for pilot bookkeeping):
#   curriculum  scripts/run_curriculum.py --preset ocr_real (read-first
#               vocab-ramp plan) until complete/stalled/deadline; prose
#               stages ship themselves + get committed.
#   export      after every curriculum pass, params-only snapshots into
#               tracked checkpoints/r4_export/ + commit.
#   aftercare   once the curriculum is terminal: golden_png eval of the
#               shipped model (VERDICT r4 item 5) and an on-chip latency
#               re-measure (VERDICT r4 item 7), each marker-gated.
set -u
cd "$(dirname "$0")/.."
R5=checkpoints/r5
CURR=checkpoints/r4/curr
mkdir -p "$R5"
PLOG=$R5/pilot.log
say() { echo "$(date -u '+%m-%d %H:%M:%S') pilot5: $*" >>"$PLOG"; }

probe() { timeout 240 python scripts/tpu_probe.py >>"$PLOG" 2>&1; }

cpu_chore() { # run ONE pending host-side chore; rc=1 when none left
  local m=$R5/chores
  mkdir -p "$m"
  if [ ! -f "$m/engine.done" ]; then
    say "chore: raster engine build"
    make -C vision_compression_project_tpu/raster/cpp >>"$PLOG" 2>&1
    touch "$m/engine.done"
    return 0
  fi
  if [ ! -f "$m/fasttests.done" ]; then
    say "chore: fast test lane"
    python -m pytest tests/ -q -m "not slow" >"$R5/fasttests.log" 2>&1
    say "chore: fast test lane rc=$? (tail: $(tail -1 "$R5/fasttests.log"))"
    touch "$m/fasttests.done"
    return 0
  fi
  return 1
}

wait_tpu() {
  # Respect the chip lock first (the bench supervisor may hold it), then
  # require a live probe.  While unreachable, do host-side chores.
  python scripts/chip_lock.py wait --timeout 2400 ||
    say "chip lock wait timed out; proceeding"
  local n=0
  until probe; do
    n=$((n + 1))
    say "tpu unreachable (probe $n); chores/backoff"
    cpu_chore || sleep 120
    python scripts/chip_lock.py wait --timeout 2400 || true
  done
  say "tpu alive"
}

newest_mtime() {
  local t
  t=$(find "$@" -type f -printf '%T@\n' 2>/dev/null | sort -n | tail -1)
  echo "${t%%.*}"
}

watched() { # watched <stale_s> <logfile> <watchdir> <cmd...>
  local stale=$1 log=$2 watch=$3
  shift 3
  setsid "$@" >>"$log" 2>&1 &
  local pid=$!
  python scripts/chip_lock.py acquire --tag pilot5 --pid $pid --pgid $pid
  say "launched pgid=$pid (stale=${stale}s): $*"
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    # The lock disappearing under us = bench preemption killed the group;
    # stop monitoring and let the outer loop re-queue behind the bench.
    if ! python scripts/chip_lock.py status | grep -q "\"pid\": $pid"; then
      if ! kill -0 "$pid" 2>/dev/null; then break; fi
    fi
    local now last
    now=$(date +%s)
    last=$(newest_mtime "$log" "$watch")
    if [ -n "$last" ] && [ $((now - last)) -gt "$stale" ]; then
      say "stale ${stale}s exceeded; killing pgid=$pid"
      kill -9 -"$pid" 2>/dev/null
      sleep 10
      python scripts/chip_lock.py release
      return 137
    fi
  done
  wait "$pid"
  local rc=$?
  python scripts/chip_lock.py release
  say "pgid=$pid exited rc=$rc"
  return $rc
}

git_commit() { # git_commit <msg> <paths...> — commit ONLY these paths
  local msg=$1
  shift
  git add -A "$@" >>"$PLOG" 2>&1
  git commit -m "$msg" -- "$@" >>"$PLOG" 2>&1 && say "committed: $msg"
}

export_stages() {
  python scripts/export_stage_params.py --curr "$CURR" \
    --out checkpoints/r4_export >>"$PLOG" 2>&1 &&
    git_commit "curriculum: stage params export (resume seed for next round)" \
      checkpoints/r4_export
}

# ---------------- phase: shipped-checkpoint gate evidence ----------------
# VERDICT r4 item 3: every number quoted in README/PARITY needs an IN-TREE
# artifact.  Re-measure the SHIPPED ocr_bpe weights (not the unshipped r4
# boost) on the chip and land the eval JSONs in tracked
# checkpoints/default/ocr_bpe/gate/.  ~10 min of chip, marker-gated, and
# only marked done when each eval exited 0 AND wrote its JSON (ADVICE r4).
SHIP=checkpoints/default/ocr_bpe
if [ ! -f "$R5/evidence.done" ] && [ -d "$SHIP" ]; then
  mkdir -p "$SHIP/gate"
  wait_tpu
  watched 900 "$R5/evidence_extract.log" "$R5" \
    python scripts/eval_extract.py --preset ocr_bpe --ckpt_dir "$SHIP" \
    --data words --font_size 24 --dpi 46 --lines 6 --pages 16 \
    --max_new 512 --json_out "$SHIP/gate/extract_eval.json"
  rc1=$?
  wait_tpu
  watched 900 "$R5/evidence_answer.log" "$R5" \
    python scripts/eval_answer.py --preset ocr_bpe --ckpt_dir "$SHIP" \
    --task agg --data real --examples 16 \
    --json_out "$SHIP/gate/agg_real_eval.json"
  rc2=$?
  wait_tpu
  watched 900 "$R5/evidence_imitate.log" "$R5" \
    python scripts/eval_answer.py --preset ocr_bpe --ckpt_dir "$SHIP" \
    --task imitate --data real --examples 16 \
    --json_out "$SHIP/gate/imitate_real_eval.json" || true
  if [ "$rc1" -eq 0 ] && [ -f "$SHIP/gate/extract_eval.json" ] &&
    [ "$rc2" -eq 0 ] && [ -f "$SHIP/gate/agg_real_eval.json" ]; then
    git_commit "gate evidence: shipped ocr_bpe re-measured on-chip" "$SHIP/gate"
    touch "$R5/evidence.done"
  else
    say "evidence evals incomplete (rc $rc1/$rc2); retry next pilot run"
  fi
fi

# ---------------- phase: curriculum ----------------
DEADLINE=${DEADLINE:-$(($(date +%s) + 8 * 3600))}
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  status=$(python3 -c "import json;print(json.load(open('$CURR/curriculum.json')).get('status',''))" 2>/dev/null || echo "")
  case "$status" in
  complete | out_of_budget | stalled*)
    say "curriculum terminal: $status"
    break
    ;;
  esac
  wait_tpu
  left_h=$(python3 -c "print(max(0.1, ($DEADLINE - $(date +%s))/3600))")
  resume=""
  [ -f "$CURR/curriculum.json" ] && resume="--resume"
  watched 1200 "$R5/curr_super.log" "$CURR" \
    python scripts/run_curriculum.py --preset ocr_real --out "$CURR" \
    --batch 32 --budget_hours "$left_h" --eval_pages 12 $resume
  export_stages
  if [ -d checkpoints/default/ocr_real ]; then
    git_commit "curriculum ship: ocr_real serving default" \
      checkpoints/default/ocr_real
  fi
  sleep 15
done
export_stages

# ---------------- phase: aftercare (only with a shipped ocr_real) ----------
if [ -d checkpoints/default/ocr_real ]; then
  if [ ! -f "$R5/goldenpng.done" ]; then
    wait_tpu
    watched 1200 "$R5/golden_png_eval.log" "$R5" \
      python scripts/eval_extract.py --preset ocr_real \
      --ckpt_dir checkpoints/default/ocr_real --data golden_png \
      --pages 12 --max_new 1024 --json_out "$R5/golden_png_eval.json"
    if [ $? -eq 0 ] && [ -f "$R5/golden_png_eval.json" ]; then
      cp "$R5/golden_png_eval.json" checkpoints/default/ocr_real/golden_png_eval.json
      git_commit "eval: shipped ocr_real scored on the reference's own page rasters" \
        checkpoints/default/ocr_real
      touch "$R5/goldenpng.done"
    else
      say "golden_png eval failed; will retry on next pilot pass"
    fi
  fi
  if [ ! -f "$R5/latency.done" ]; then
    wait_tpu
    watched 900 "$R5/latency.log" "$R5" python bench_latency.py
    if [ $? -eq 0 ]; then
      touch "$R5/latency.done"
    fi
  fi
fi
say "pilot finished"
