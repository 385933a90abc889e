#!/bin/bash
# Round-5 phase 2: chip work queued BEHIND the curriculum (VERDICT r4
# items 3/6): refresh the aggregation gate artifact with the new served
# (auto: analytic->lm) metric, boost real-evidence answer imitation
# toward the 0.8 target with answer-focused training, and rehearse the
# full bench path once so the driver's round-end run hits a warm compile
# cache.  Coordinates with scripts/round5_pilot.sh purely via the chip
# lock (scripts/chip_lock.py): each phase waits for the lock, holds it
# while on the chip, and releases it after — the two supervisors never
# overlap on the tunnel.
set -u
cd "$(dirname "$0")/.."
P2=checkpoints/r5/phase2
mkdir -p "$P2"
PLOG=$P2/phase2.log
say() { echo "$(date -u '+%m-%d %H:%M:%S') phase2: $*" >>"$PLOG"; }

probe() { timeout 240 python scripts/tpu_probe.py >>"$PLOG" 2>&1; }
wait_tpu() {
  python scripts/chip_lock.py wait --timeout 3600 || true
  local n=0
  until probe; do
    n=$((n + 1))
    say "tpu unreachable (probe $n); retry in 120s"
    sleep 120
    python scripts/chip_lock.py wait --timeout 3600 || true
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
  python scripts/chip_lock.py acquire --tag phase2 --pid $pid --pgid $pid
  say "launched pgid=$pid (stale=${stale}s): $*"
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
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

SHIP=checkpoints/default/ocr_bpe

# ---------------- phase: agg gate refresh (served auto metric) ----------
if [ ! -f "$P2/agggate.done" ]; then
  wait_tpu
  watched 900 "$P2/agg_refresh.log" "$P2" \
    python scripts/eval_answer.py --preset ocr_bpe --ckpt_dir "$SHIP" \
    --task agg --data real --examples 16 \
    --json_out "$SHIP/gate/agg_real_eval.json"
  if [ $? -eq 0 ] && [ -f "$SHIP/gate/agg_real_eval.json" ]; then
    git_commit "gate evidence: agg eval refreshed with served (auto) metric" \
      "$SHIP/gate"
    touch "$P2/agggate.done"
  else
    say "agg refresh failed; retry on next run"
  fi
fi

# ---------------- phase: answer-imitation boost ----------------
# Focused answer-only training on REAL evidence (qa_data real,
# answer_every 1) to push imitation similarity toward the 0.8 target.
AB=$P2/answer_boost
AB_STEPS=${AB_STEPS:-2000}
if [ ! -f "$P2/aboost.done" ]; then
  attempt=0
  while [ $attempt -lt 6 ]; do
    attempt=$((attempt + 1))
    init="$SHIP"
    ls "$AB"/step_* >/dev/null 2>&1 && init=$AB
    wait_tpu
    watched 900 "$P2/aboost_attempt_${attempt}.log" "$AB" \
      python scripts/train_answer.py --preset ocr_bpe --init_from "$init" \
      --steps "$AB_STEPS" --batch 32 --lr 3e-4 --answer_every 2 \
      --agg_frac 0.25 --qa_data real --font_size 24 --dpi 46 --lines 6 \
      --text_len 320 --seed $((50 + attempt)) --ckpt_dir "$AB" \
      --ckpt_every 250 --log_every 25
    rc=$?
    [ $rc -eq 0 ] && break
  done
  touch "$P2/aboost.done"
fi

# ---------------- phase: answer-boost gate + ship ----------------
# Ship ONLY if imitation improves AND extraction holds (the boost must
# not cannibalize reading); eval failures leave the phase retryable
# (ADVICE r4 #2 pattern).
if [ ! -f "$P2/abgate.done" ] && ls "$AB"/step_* >/dev/null 2>&1; then
  wait_tpu
  watched 900 "$P2/ab_imitate.log" "$P2" \
    python scripts/eval_answer.py --preset ocr_bpe --ckpt_dir "$AB" \
    --task imitate --data real --examples 16 \
    --json_out "$P2/ab_imitate.json"
  rc1=$?
  wait_tpu
  watched 900 "$P2/ab_extract.log" "$P2" \
    python scripts/eval_extract.py --preset ocr_bpe --ckpt_dir "$AB" \
    --data words --font_size 24 --dpi 46 --lines 6 --pages 16 \
    --max_new 512 --json_out "$P2/ab_extract.json"
  rc2=$?
  wait_tpu
  watched 900 "$P2/ab_agg.log" "$P2" \
    python scripts/eval_answer.py --preset ocr_bpe --ckpt_dir "$AB" \
    --task agg --data real --examples 16 --json_out "$P2/ab_agg.json" || true
  if [ "$rc1" -eq 0 ] && [ -f "$P2/ab_imitate.json" ] &&
    [ "$rc2" -eq 0 ] && [ -f "$P2/ab_extract.json" ]; then
    imit=$(python3 -c "import json;print(json.load(open('$P2/ab_imitate.json'))['similarity_mean'])" 2>/dev/null || echo 0)
    extr=$(python3 -c "import json;print(json.load(open('$P2/ab_extract.json'))['markdown_similarity_mean'])" 2>/dev/null || echo 0)
    say "answer boost: imitate=$imit (ship floor 0.65; baseline 0.589), extract=$extr (hold floor 0.40)"
    if python3 -c "exit(0 if float('$imit') >= 0.65 and float('$extr') >= 0.40 else 1)"; then
      python scripts/ship_checkpoint.py --preset ocr_bpe --ckpt_dir "$AB" \
        --font_size 24 --dpi 46 --lines 6 --data words \
        --tasks extract,answer --steps $((2000 + AB_STEPS)) \
        --note "r5 answer boost: imitate_real=$imit extract=$extr (answer_every=2, qa_data real)" \
        --evidence "$P2/ab_imitate.json" "$P2/ab_extract.json" "$P2/ab_agg.json" \
        >>"$PLOG" 2>&1
      git_commit "Ship answer-boosted ocr_bpe (imitate_real $imit, extract held at $extr)" \
        "$SHIP"
      say "answer boost shipped"
    else
      say "answer boost below floors; not shipped"
    fi
    touch "$P2/abgate.done"
  else
    say "answer-boost evals incomplete (rc $rc1/$rc2); retry next run"
  fi
fi

# ---------------- phase: bench rehearsal (warm the compile cache) -------
if [ ! -f "$P2/benchwarm.done" ]; then
  wait_tpu
  say "bench rehearsal (driver-equivalent bare run)"
  timeout 900 python bench.py >"$P2/bench_rehearsal.json" 2>>"$PLOG"
  if [ -s "$P2/bench_rehearsal.json" ]; then
    say "rehearsal: $(cat "$P2/bench_rehearsal.json")"
    touch "$P2/benchwarm.done"
  fi
fi
say "phase2 finished"
