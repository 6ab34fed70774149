#!/bin/bash
# Round-4 chain, take 3: post-chain8 continuation for the last ~hour of
# chip time this round.
#
# Context: chain8 (vq16a quality closure -> qp prereqs -> online TTFT
# re-rows -> gptL100 FID point -> spec_b32) stops STARTING rows at its
# 12:02 deadline. gptL_train_r4 (2.5 h) was pre-marked done: it could not
# finish before round end and would hold the single TPU client against the
# driver's end-of-round bench. Its FID-vs-steps tail (1000/3000-step
# points) carries to round 5.
#
# This chain waits for chain8's PID to exit (NO tpu probing while chain8
# holds the chip: a blocked probe killed by `timeout` risks wedging the
# tunnel grant), then runs the two highest-value unanswered chip rows:
#
#   probe_j_r4   int4-KV packing verdict (fused s4-safe probe, batch 128):
#                does the TPU backend stream packed s4 bytes through the
#                decode dots, or upcast-materialize (negating the win)?
#                CLAUDE.md open question; VERDICT r3 weak-#2.
#   probe_l_r4   batch-256 int4 — the next headline candidate if J says
#                "packed" (same KV bytes/step as the b128-int8 champion
#                with 2x the rows).
#
#   nohup bash scripts/chip_chain9.sh > results_chain/chain9.log 2>&1 &
#   echo $! > results_chain/chain9.pid
#
# Stop cleanly: touch results_chain/STOP (never SIGKILL a TPU client).

set -u
cd "$(dirname "$0")/.."
OUT=$PWD/results_chain
mkdir -p "$OUT"
DEADLINE=$(( $(date +%s) + 12000 ))   # absolute guard; row gate below is tighter

say() { echo "[$(date -u +%H:%M:%S)] $*"; }

# ---- wait for chain8 to exit (pid-based; no TPU clients spawned) --------
if [ -f "$OUT/chain8.pid" ]; then
    C8=$(cat "$OUT/chain8.pid")
    while kill -0 "$C8" 2>/dev/null; do
        [ -f "$OUT/STOP" ] && { say "STOP file — exiting"; exit 0; }
        say "chain8 ($C8) still running; sleeping 120s"
        sleep 120
    done
    say "chain8 exited"
fi

probe_tpu() {
    timeout 240 python -c \
      "import jax; assert jax.default_backend() == 'tpu'" 2>/dev/null
}

wait_for_tpu() {
    while true; do
        [ -f "$OUT/STOP" ] && { say "STOP file — exiting"; exit 0; }
        [ "$(date +%s)" -ge "$DEADLINE" ] && { say "deadline — exiting"; exit 0; }
        if probe_tpu; then say "TPU tunnel UP"; return 0; fi
        say "tunnel still down; sleeping 300s"
        sleep 300
    done
}

run() {
    local tag=$1 tmo=$2; shift 2
    [ -f "$OUT/$tag.done" ] && { say "skip $tag (done)"; return 0; }
    [ -f "$OUT/STOP" ] && exit 0
    [ "$(date +%s)" -ge "$DEADLINE" ] && { say "deadline — exiting"; exit 0; }
    wait_for_tpu
    say "=== $tag (timeout ${tmo}s) ==="
    if timeout "$tmo" "$@" >> "$OUT/$tag.log" 2>&1; then
        touch "$OUT/$tag.done"; say "$tag OK"
    else
        say "$tag FAILED rc=$? (log: results_chain/$tag.log)"
    fi
}

run probe_j_r4 1800 python scripts/probe_multi_decode.py J
run probe_l_r4 1800 python scripts/probe_multi_decode.py L
# only if time remains (rows chain8's deadline cut):
run t2i_data_r4 900 python scripts/t2i_quality.py data
say "chain9 complete"
