#!/bin/bash
# Round-4 chain, take 2. The VM re-provision at 01:47 wiped every
# gitignored artifact (orbax checkpoints, codes, npy datasets) while the
# git-tracked done-markers survived — so chain7's rows either skip (marker
# present, artifact gone) or fail (loader finds no checkpoint). This chain
# uses fresh _r4 tags and re-runs the prerequisites, ordered by verdict
# value for the ~3.5 h left in the session:
#
#   vq16a_*_r4    VERDICT #1 closure: retrain the adaptive-disc-weight
#                 VQ-16 GAN (the 02:00 run's log shows rec loss STABLE at
#                 ~0.006 post-disc vs 0.11-0.48 noise with the fixed weight,
#                 but its checkpoint was wiped before a raw recon ran);
#                 then recon on raw AND ema weights (--ema-decay 0.999).
#   qp_vq/codes   prerequisites for every GPT quality row (wiped).
#   online_r5     TTFT re-rows with the admission-stall fix from this
#                 session (chain rows exec current working tree).
#   gptL series   the missing half of the 2-series FID-vs-steps figure
#                 (ref tools/draw_figure.py:6-12): 100-step point + one
#                 3000-step train checkpointed at 1000 -> 3 points.
#   spec_b32      frozen-cache speculative serving at batch 32 (V#4).
#   gpt7b         W4 ladder retry post layer-sequential-fabrication fix.
#   kvgate        int4/int8 KV quality gate on the trained GPT-L (V#8).
#   t2i loop      closed caption-control loop (V#5) — likely past deadline.
#
#   nohup bash scripts/chip_chain8.sh > results_chain/chain8.log 2>&1 &
#   echo $! > results_chain/chain8.pid
#
# Stop cleanly: touch results_chain/STOP (never SIGKILL a TPU client).

set -u
cd "$(dirname "$0")/.."
OUT=$PWD/results_chain
mkdir -p "$OUT"
DEADLINE=$(( $(date +%s) + 12600 ))   # stop STARTING rows after 3.5 h

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

# --- P0: VQ-16 adaptive-weight GAN, retrain + BOTH recon reads (V#1) ----
run vq16a_train_r4 9000 python scripts/vq16_loop.py train --dir results_vq16a \
    --adaptive --ema --max-steps 4000 --disc-start 1000
run vq16a_recon_raw_r4 2700 python scripts/vq16_loop.py recon --dir results_vq16a
run vq16a_recon_ema_r4 2700 python scripts/vq16_loop.py recon --dir results_vq16a --ema

# --- P1: quality-pipeline prerequisites (wiped checkpoints/codes) --------
run qp_vq_r4    5400 python scripts/quality_loop.py vq --steps 1500
run qp_codes_r4 2700 python scripts/quality_loop.py codes

# --- P2: online TTFT re-rows with the fixed engine (V#3) -----------------
run online_b64_r5 5400 python scripts/bench_serving.py online GPT-L \
    --batch 64 --kv-int8 --rates 2 4 8 16 --num-requests 96

# --- P3: GPT-L FID-vs-steps series (missing half of the figure, V#2c) ----
run gptL100_train_r4  2700 python scripts/quality_loop.py gpt \
    --gpt-model GPT-L --gpt-dir gptL100 --steps 100 --ckpt-every 100
run gptL100_sample_r4 3600 python scripts/quality_loop.py sample \
    --gpt-model GPT-L --gpt-dir gptL100 --step 100
run gptL100_fid_r4    1800 python scripts/quality_loop.py fid \
    --gpt-dir gptL100 --step 100
run gptL_train_r4 9000 python scripts/quality_loop.py gpt \
    --gpt-model GPT-L --gpt-dir gptL --steps 3000 --ckpt-every 1000
for s in 1000 3000; do
    run gptL_sample_r4_$s 3600 python scripts/quality_loop.py sample \
        --gpt-model GPT-L --gpt-dir gptL --step $s
    run gptL_fid_r4_$s 1800 python scripts/quality_loop.py fid \
        --gpt-dir gptL --step $s
done
run fid_merge_r4 600 python scripts/merge_fid_series.py

# --- P4: speculative serving at batch 32 (V#4 measurement) ---------------
run spec_b32_r4 5400 python scripts/bench_serving.py offline GPT-L \
    --batch 32 --draft-model GPT-B --spec-k 4

# --- P5: GPT-7B W4 ladder retry (V#2b; post-fabrication-fix) -------------
run gpt7b_w4_kv8_r4 7200 python scripts/bench_serving.py offline GPT-7B \
    --batch 16 --weight-int4 --kv-int8

# --- P6: int4/int8 KV quality gate on the trained GPT-L (V#8) ------------
run kvgate_greedy_r4 5400 python scripts/kv_quality_gate.py greedy
for kv in bf16 int8 int4; do
    run kvgate_sample_r4_$kv 5400 python scripts/kv_quality_gate.py sample --kv $kv
    run kvgate_fid_r4_$kv    1800 python scripts/kv_quality_gate.py fid --kv $kv
done

# --- P7: t2i caption-control loop (V#5) ----------------------------------
run t2i_data_r4   900  python scripts/t2i_quality.py data
run t2i_train_r4  7200 python scripts/t2i_quality.py train --steps 3000
run t2i_sample_trained_r4 5400 python scripts/t2i_quality.py sample --tag trained
run t2i_sample_random_r4  5400 python scripts/t2i_quality.py sample --tag random_init
run t2i_sample_uncond_r4  5400 python scripts/t2i_quality.py sample --tag uncond
run t2i_score_r4  3600 python scripts/t2i_quality.py score

# --- final: fresh headline bench ------------------------------------------
run bench8 3600 bash -c "python bench.py > $OUT/bench_chain8.json"

say "chain8 complete"
