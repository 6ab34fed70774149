#!/bin/bash
# Second-stage chip work: runs AFTER scripts/chip_chain.sh (waits for its
# pid), same gating/markers. Lower-priority on-chip questions:
#   - probe_multi_decode J/K: does the TPU backend stream packed s4 KV bytes
#     through the decode dots, or upcast-materialize an s8 copy?
#     (CLAUDE.md open chip question.)
#   - GPT-7B serving ladder rows: the staged W4 config (int4 weights
#     ~3.3 GB + scales). KV HBM at 576 tokens is ~151 MB/row int8
#     (~75 int4), so batch 16 kv8 (~4.8 GB) and batch 32 kv4 (~4.8 GB)
#     both fit the 16 GB chip with fused fabrication.
#
#   nohup bash scripts/chip_chain2.sh > results_chain/chain2.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=$PWD/results_chain
mkdir -p "$OUT"
DEADLINE=$(( $(date +%s) + 12*3600 ))

say() { echo "[$(date -u +%H:%M:%S)] $*"; }

# Wait for the first chain to exit (ONE TPU client at a time).
if [ -f "$OUT/chain.pid" ]; then
    P=$(cat "$OUT/chain.pid")
    while kill -0 "$P" 2>/dev/null; do
        [ -f "$OUT/STOP" ] && { say "STOP — exiting"; exit 0; }
        say "chain1 (pid $P) still running; sleeping 300s"
        sleep 300
    done
fi
say "chain1 done; starting chain2"

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

run probe_kv4 3600 python scripts/probe_multi_decode.py J K
run gpt7b_w4_kv8 5400 python scripts/bench_serving.py offline GPT-7B \
    --batch 16 --weight-int4 --kv-int8
run gpt7b_w4_kv4 5400 python scripts/bench_serving.py offline GPT-7B \
    --batch 32 --weight-int4 --kv-int4

say "chain2 complete"
