#!/bin/bash
# Online-serving rerun after the adaptive-window policy fix (round 5):
# grow at partial occupancy too (drain tail), and the 7B online row with
# the corrected _kvm key (the first attempt died on a stale CLI guard).
# Overwrites the same bench_serving_online.json keys — artifact gating is
# deliberately NOT used for the two GPT-L reruns (same config, new policy).
#
#   CHAIN_WAIT_PID=<pid> nohup bash scripts/chip_chain15.sh \
#       > results_chain/chain15.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=$PWD/results_chain

say() { echo "[$(date -u +%H:%M:%S)] $*"; }

if [ -n "${CHAIN_WAIT_PID:-}" ]; then
    while kill -0 "$CHAIN_WAIT_PID" 2>/dev/null; do
        say "predecessor ($CHAIN_WAIT_PID) still running; sleeping 60s"
        sleep 60
    done
    say "predecessor exited"
fi
rm -f "$OUT/STOP"

run() {
    local tag=$1 tmo=$2; shift 2
    [ -f "$OUT/STOP" ] && { say "STOP — exiting"; exit 0; }
    say "=== $tag (timeout ${tmo}s) ==="
    if timeout "$tmo" "$@" >> "$OUT/$tag.log" 2>&1; then
        say "$tag OK"
    else
        say "$tag FAILED rc=$? (log: results_chain/$tag.log)"
    fi
}

# retry: gptL 1000-step FID died on a transient tunnel error
# ("response body closed"); the samples npz exists
run gptL_fid_1000_v2 2700 \
    python scripts/quality_loop.py fid --gpt-dir gptL --step 1000
run fid_merge_d 600 python scripts/merge_fid_series.py

# GPT-L adaptive rerun, new growth policy (one process, both rates)
run online_adapt2_b64 7200 \
    python scripts/bench_serving.py online GPT-L --batch 64 --kv-int8 \
        --decode-window 16 --max-window 128 --rates 8 16 --num-requests 96
# GPT-7B first ONLINE row (merged int8 KV + w8, adaptive windows)
run online_7b_b8_v2 7200 \
    python scripts/bench_serving.py online GPT-7B --batch 8 --weight-int8 \
        --kv-int8 --kv-merged --decode-window 16 --max-window 64 \
        --rates 1 --num-requests 24

say "chain15 complete"
