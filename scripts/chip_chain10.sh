#!/bin/bash
# Round-4 chain, take 4 (fresh session 2026-08-20 23:30 UTC). The VM was
# re-provisioned ~23:00, wiping every gitignored artifact again (orbax
# checkpoints, codes, npz) — chain8's qp_vq_r4/qp_codes_r4/gptL100 train+
# sample artifacts are gone; only git-tracked logs and done-markers
# survive. chain8 died at round-snapshot time mid-gptL100_fid; chain9
# (int4 probes) never started.
#
# Value order for this session (highest value per chip-minute first;
# checkpoint-free rows before prereq rebuilds):
#
#   probe_j/l_r4  int4-KV packing verdict (s4-safe fused probe): does the
#                 TPU backend stream packed s4 bytes through the decode
#                 dots (b256-kv4 ~16k tok/s headline candidate) or
#                 upcast-materialize? CLAUDE.md open question, V#2.
#   spec_b32      frozen-cache speculative serving at batch 32 (V#4):
#                 proves the 2x-HBM fix at realistic occupancy.
#   gpt7b_w4_kv8  GPT-7B W4 ladder retry (V#2b, fabrication fix landed).
#   qp_* _r5      quality prereq rebuild (VQ 1500 steps + codes) — gates
#                 every FID row below.
#   gptL100 _r5   GPT-L 100-step FID point (series half, V#2c).
#   kvgate/t2i    only if chip time remains.
#
#   nohup bash scripts/chip_chain10.sh > results_chain/chain10.log 2>&1 &
#   echo $! > results_chain/chain10.pid
#
# Stop cleanly: touch results_chain/STOP (never SIGKILL a TPU client).

set -u
cd "$(dirname "$0")/.."
OUT=$PWD/results_chain
mkdir -p "$OUT"
DEADLINE=$(( $(date +%s) + 14400 ))   # stop STARTING rows after 4 h

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

# --- P0: int4-KV packing verdict (checkpoint-free) -----------------------
run probe_j_r4 1800 python scripts/probe_multi_decode.py J
run probe_l_r4 1800 python scripts/probe_multi_decode.py L

# --- P1: speculative serving at batch 32 (checkpoint-free) ---------------
run spec_b32_r4 4500 python scripts/bench_serving.py offline GPT-L \
    --batch 32 --draft-model GPT-B --spec-k 4

# --- P2: GPT-7B W4 ladder retry (checkpoint-free) ------------------------
run gpt7b_w4_kv8_r4 7200 python scripts/bench_serving.py offline GPT-7B \
    --batch 16 --weight-int4 --kv-int8

# --- P3: quality prereq rebuild (post-wipe) ------------------------------
run qp_vq_r5    5400 python scripts/quality_loop.py vq --steps 1500
run qp_codes_r5 2700 python scripts/quality_loop.py codes

# --- P4: GPT-L 100-step FID point (series half) --------------------------
run gptL100_train_r5  2700 python scripts/quality_loop.py gpt \
    --gpt-model GPT-L --gpt-dir gptL100 --steps 100 --ckpt-every 100
run gptL100_sample_r5 3600 python scripts/quality_loop.py sample \
    --gpt-model GPT-L --gpt-dir gptL100 --step 100
run gptL100_fid_r5    1800 python scripts/quality_loop.py fid \
    --gpt-dir gptL100 --step 100
run fid_merge_r5 600 python scripts/merge_fid_series.py

# --- P5: t2i caption-control loop (V#5) ----------------------------------
run t2i_data_r5   900  python scripts/t2i_quality.py data
run t2i_train_r5  7200 python scripts/t2i_quality.py train --steps 3000
run t2i_sample_trained_r5 5400 python scripts/t2i_quality.py sample --tag trained
run t2i_sample_random_r5  5400 python scripts/t2i_quality.py sample --tag random_init
run t2i_sample_uncond_r5  5400 python scripts/t2i_quality.py sample --tag uncond
run t2i_score_r5  3600 python scripts/t2i_quality.py score

# --- P6: KV quality gates on the trained GPT-L ---------------------------
run kvgate_greedy_r5 5400 python scripts/kv_quality_gate.py greedy
for kv in bf16 int8 int4; do
    run kvgate_sample_r5_$kv 5400 python scripts/kv_quality_gate.py sample --kv $kv
    run kvgate_fid_r5_$kv    1800 python scripts/kv_quality_gate.py fid --kv $kv
done

# --- final: fresh headline bench -----------------------------------------
run bench10 3600 bash -c "python bench.py > $OUT/bench_chain10.json"

say "chain10 complete"
