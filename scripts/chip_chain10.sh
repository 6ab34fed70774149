#!/bin/bash
# Round-5 chip chain: the full carry-over list (README "Carry-over to
# round 5"), value-ordered. Written at the end of round 4 so round 5 can
# launch it in its first minute:
#
#   nohup bash scripts/chip_chain10.sh > results_chain/chain10.log 2>&1 &
#   echo $! > results_chain/chain10.pid
#
# Before launching: check results_chain/chain9.log — if probe_j_r4/probe_l_r4
# completed there, their .done markers skip them here. If probe J says the
# TPU backend STREAMS packed s4 (window_s at b128-int4 < b128-int8's), point
# bench.py at batch-256 int4 KV (run_engine_int8 -> kv_int4=True, batch=256)
# AFTER probe L confirms, and re-verify on-chip before relying on it.
#
# Adjust DEADLINE_H to the round's wall budget minus ~1 h (the driver's
# end-of-round bench needs the chip free; one TPU client at a time).
# Stop cleanly: touch results_chain/STOP (never SIGKILL a TPU client).

set -u
cd "$(dirname "$0")/.."
OUT=$PWD/results_chain
mkdir -p "$OUT"
DEADLINE_H=${DEADLINE_H:-3}
DEADLINE=$(( $(date +%s) + DEADLINE_H * 3600 ))

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

# --- P0: int4 packing probes if chain9 didn't finish them ----------------
run probe_j_r4 1800 python scripts/probe_multi_decode.py J
run probe_l_r4 1800 python scripts/probe_multi_decode.py L

# --- P1: KV quality gates on the trained GPT-L (VERDICT r3 #8) -----------
run kvgate_greedy_r4 5400 python scripts/kv_quality_gate.py greedy
for kv in bf16 int8 int4; do
    run kvgate_sample_r4_$kv 5400 python scripts/kv_quality_gate.py sample --kv $kv
    run kvgate_fid_r4_$kv    1800 python scripts/kv_quality_gate.py fid --kv $kv
done

# --- P2: gptL FID-vs-steps tail (1000/3000-step points) ------------------
run gptL_train_r5 10800 python scripts/quality_loop.py gpt \
    --gpt-model GPT-L --gpt-dir gptL --steps 3000 --ckpt-every 1000
for s in 1000 3000; do
    run gptL_sample_r5_$s 3600 python scripts/quality_loop.py sample \
        --gpt-model GPT-L --gpt-dir gptL --step $s
    run gptL_fid_r5_$s 1800 python scripts/quality_loop.py fid \
        --gpt-dir gptL --step $s
done
run fid_merge_r5 600 python scripts/merge_fid_series.py

# --- P3: t2i caption-control loop (VERDICT r3 weak-#6) -------------------
run t2i_data_r4   900  python scripts/t2i_quality.py data
run t2i_train_r4  7200 python scripts/t2i_quality.py train --steps 3000
run t2i_sample_trained_r4 5400 python scripts/t2i_quality.py sample --tag trained
run t2i_sample_random_r4  5400 python scripts/t2i_quality.py sample --tag random_init
run t2i_sample_uncond_r4  5400 python scripts/t2i_quality.py sample --tag uncond
run t2i_score_r4  3600 python scripts/t2i_quality.py score

# --- P4: GPT-7B ladder (retry int8-KV; add int4-KV if time) --------------
run gpt7b_w4_kv8_r4 7200 python scripts/bench_serving.py offline GPT-7B \
    --batch 16 --weight-int4 --kv-int8
run gpt7b_w4_kv4_r5 7200 python scripts/bench_serving.py offline GPT-7B \
    --batch 16 --weight-int4 --kv-int4

# --- P5: spec serving online latency (device-resident spec args) ---------
run spec_online_r5 5400 python scripts/bench_serving.py online GPT-L \
    --batch 16 --draft-model GPT-B --spec-k 4 --rates 1 2 4 --num-requests 48
say "chain10 complete"
