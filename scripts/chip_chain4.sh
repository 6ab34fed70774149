#!/bin/bash
# Round-4 chain, stage 2: runs AFTER scripts/chip_chain3.sh (waits on its
# pid). Rows:
#   probe_s4        s4 dispatch viability + effective KV read bandwidth
#                   (bf16/int8/s4/u8-packed) + packed-nibble numerics —
#                   decides the int4-KV production representation.
#   probe_kv4_retry the decode-window J/K/L probe (works iff s4 arrays can
#                   cross jit boundaries on this backend; probe_s4 row A).
#   online_b64_r4 / online_b32_r4: the verdict-#3 TTFT re-rows with the
#                   fixed engine (complete prewarm incl. solo-admission
#                   prefill bucket; device-resident slot updates; cohort
#                   first-token sampling; cached null embed).
#
#   nohup bash scripts/chip_chain4.sh > results_chain/chain4.log 2>&1 &
#   echo $! > results_chain/chain4.pid

set -u
cd "$(dirname "$0")/.."
OUT=$PWD/results_chain
mkdir -p "$OUT"
DEADLINE=$(( $(date +%s) + 12*3600 ))

say() { echo "[$(date -u +%H:%M:%S)] $*"; }

if [ -f "$OUT/chain3.pid" ]; then
    P=$(cat "$OUT/chain3.pid")
    while kill -0 "$P" 2>/dev/null; do
        [ -f "$OUT/STOP" ] && { say "STOP — exiting"; exit 0; }
        say "chain3 (pid $P) still running; sleeping 300s"
        sleep 300
    done
fi
say "chain3 done; starting chain4"

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

run probe_s4 3600 python scripts/probe_s4_layout.py A C B
run probe_kv4_retry 5400 python scripts/probe_multi_decode.py J K L

run online_b64_r4 5400 python scripts/bench_serving.py online GPT-L \
    --batch 64 --kv-int8 --rates 2 4 8 16 --num-requests 96
run online_b32_r4 3600 python scripts/bench_serving.py online GPT-L \
    --batch 32 --kv-int8 --rates 2 4 8 16 --num-requests 64

say "chain4 complete"
