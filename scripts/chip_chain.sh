#!/bin/bash
# Chip-work chain for the verdict items that need the real TPU
# (VERDICT r2 #3 online-serving occupancy, #4 VQ-16@256 + GPT-L FID series).
#
# The axon tunnel has been down since 2026-08-17 20:08 UTC; this script
# waits for it (subprocess probe with timeout — an in-process jax.devices()
# against a downed backend hangs forever, see bench.py), then runs the
# phases SEQUENTIALLY (one TPU client at a time, CLAUDE.md). Every phase is
# resumable (--resume / _merge semantics), so re-running the chain after an
# interruption continues where it left off.
#
#   nohup bash scripts/chip_chain.sh > results_chain/chain.log 2>&1 &
#
# Stop cleanly: touch results_chain/STOP  (never SIGKILL a TPU client —
# a killed client wedges the tunnel grant ~10 min).

set -u
cd "$(dirname "$0")/.."
REPO=$PWD
OUT=$REPO/results_chain
mkdir -p "$OUT"
DEADLINE=$(( $(date +%s) + 6*3600 ))   # stop starting new work after 6 h

say() { echo "[$(date -u +%H:%M:%S)] $*"; }

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

# run <tag> <timeout_s> <cmd...> — tunnel-gated, bounded (SIGTERM), logged,
# and skipped on re-runs once its .done marker exists.
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

# --- Phase A: online serving at throughput-optimal occupancy (verdict #3).
# batch 64 first (the load-bearing claim is >=32), batch 32 second.
run online_b64 5400 python scripts/bench_serving.py online GPT-L \
    --batch 64 --kv-int8 --rates 2 4 8 16 --num-requests 96
run online_b32 3600 python scripts/bench_serving.py online GPT-L \
    --batch 32 --kv-int8 --rates 2 4 8 16 --num-requests 64

# --- Phase B: VQ-16 @256 to plateau + rFID loop (verdict #4a).
# Resumes from the step-800 checkpoint in results_vq16; ~2.7 steps/s.
run vq16_train 5400 python scripts/vq16_loop.py train \
    --max-steps 3000 --disc-start 1000
run vq16_recon 2700 python scripts/vq16_loop.py recon

# --- Phase C: GPT-L second FID series on the SAME VQ-8 codes (verdict #4b).
# Mirrors the GPT-B run: separate 100-step dir for the early point, then the
# main run with ckpt-every 1000; sample+fid per kept step; merge the figure.
run gptL100_train 2700 python scripts/quality_loop.py gpt \
    --gpt-model GPT-L --gpt-dir gptL100 --steps 100 --ckpt-every 100
run gptL100_sample 3600 python scripts/quality_loop.py sample \
    --gpt-model GPT-L --gpt-dir gptL100 --step 100
run gptL100_fid 1800 python scripts/quality_loop.py fid \
    --gpt-dir gptL100 --step 100
run gptL_train 10800 python scripts/quality_loop.py gpt \
    --gpt-model GPT-L --gpt-dir gptL --steps 6000 --ckpt-every 1000
for s in 1000 3000 6000; do
    run gptL_sample$s 3600 python scripts/quality_loop.py sample \
        --gpt-model GPT-L --gpt-dir gptL --step $s
    run gptL_fid$s 1800 python scripts/quality_loop.py fid \
        --gpt-dir gptL --step $s
done
run fid_merge 600 python scripts/merge_fid_series.py

# --- Phase D: fresh headline bench on-chip (records a current number in-repo
# in case the tunnel is down again when the driver runs bench.py).
run bench 3600 bash -c "python bench.py > $OUT/bench_chain.json"

say "chain complete"
