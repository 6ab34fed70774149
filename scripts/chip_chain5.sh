#!/bin/bash
# Round-4 chain, stage 3: runs AFTER scripts/chip_chain4.sh. Rows:
#   spec_b32        engine speculative mode at batch 32 (VERDICT r3 #4 done-
#                   criterion): possible now that _spec_block_multi takes
#                   frozen caches + returns window buffers (no 2x cache HBM).
#   t2i_*           closed t2i caption-control loop (VERDICT r3 #5) on the
#                   quality pipeline's VQ-8 codes + pseudo-T5 features.
#   kvgate_*        int4/int8 KV quality gate on the trained GPT-L
#                   (VERDICT r3 #8): greedy match rates + per-mode FID.
#
#   nohup bash scripts/chip_chain5.sh > results_chain/chain5.log 2>&1 &
#   echo $! > results_chain/chain5.pid

set -u
cd "$(dirname "$0")/.."
OUT=$PWD/results_chain
mkdir -p "$OUT"
DEADLINE=$(( $(date +%s) + 18*3600 ))

say() { echo "[$(date -u +%H:%M:%S)] $*"; }

if [ -f "$OUT/chain4.pid" ]; then
    P=$(cat "$OUT/chain4.pid")
    while kill -0 "$P" 2>/dev/null; do
        [ -f "$OUT/STOP" ] && { say "STOP — exiting"; exit 0; }
        say "chain4 (pid $P) still running; sleeping 300s"
        sleep 300
    done
fi
say "chain4 done; starting chain5"

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

# --- speculative engine at batch 32 (frozen-cache spec block).
run spec_b32 5400 python scripts/bench_serving.py offline GPT-L \
    --batch 32 --draft-model GPT-B --spec-k 4

# --- t2i caption-control loop (needs chain3 qp_codes + qp_vq).
run t2i_data   900  python scripts/t2i_quality.py data
run t2i_train  7200 python scripts/t2i_quality.py train --steps 3000
run t2i_sample_trained 5400 python scripts/t2i_quality.py sample --tag trained
run t2i_sample_random  5400 python scripts/t2i_quality.py sample --tag random_init
run t2i_sample_uncond  5400 python scripts/t2i_quality.py sample --tag uncond
run t2i_score  3600 python scripts/t2i_quality.py score

# --- int4/int8 KV quality gate on the trained GPT-L (chain3 gptL_train3).
run kvgate_greedy 5400 python scripts/kv_quality_gate.py greedy
run kvgate_sample_bf16 5400 python scripts/kv_quality_gate.py sample --kv bf16
run kvgate_fid_bf16    1800 python scripts/kv_quality_gate.py fid --kv bf16
run kvgate_sample_int8 5400 python scripts/kv_quality_gate.py sample --kv int8
run kvgate_fid_int8    1800 python scripts/kv_quality_gate.py fid --kv int8
run kvgate_sample_int4 5400 python scripts/kv_quality_gate.py sample --kv int4
run kvgate_fid_int4    1800 python scripts/kv_quality_gate.py fid --kv int4

say "chain5 complete"
