#!/bin/bash
# Round-4 chip-work chain (VERDICT r3 items #1 and #2). Rows, in value order:
#
#   probe_kv4_jkl   int4-KV packing question (probe J/K/L) — fixed this
#                   round: init_kv_cache_int4 now builds under jit (the
#                   eager s4 fill crashed over the tunnel).
#   vq16a_*         FRESH VQ-16 @256 GAN with --disc-adaptive-weight + EMA
#                   (verdict #1): the round-3 fixed-weight run collapsed
#                   from 22.0 dB to 12.8 dB once the disc engaged.
#   qp_* gptB* gptL* Regenerated quality pipeline (round-3 chain failed on
#                   the missing codes dir) + BOTH FID-vs-steps series on the
#                   SAME fresh VQ-8 codes, then the 2-series figure.
#   gpt7b_*         First GPT-7B rows (W4 fabrication now layer-sequential;
#                   the vmapped init OOMed 16 GB with f32[32,4096,11008]).
#   bench           fresh headline number.
#
#   nohup bash scripts/chip_chain3.sh > results_chain/chain3.log 2>&1 &
#   echo $! > results_chain/chain3.pid
#
# Stop cleanly: touch results_chain/STOP (never SIGKILL a TPU client).

set -u
cd "$(dirname "$0")/.."
OUT=$PWD/results_chain
mkdir -p "$OUT"
DEADLINE=$(( $(date +%s) + 7*3600 ))

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

# --- Phase A: int4-KV packing probe (decides the next headline config).
run probe_kv4_jkl 5400 python scripts/probe_multi_decode.py J K L

# --- Phase B: adaptive-weight VQ-16 GAN, fresh dir (verdict #1).
run vq16a_train 9000 python scripts/vq16_loop.py train --dir results_vq16a \
    --adaptive --ema --max-steps 4000 --disc-start 1000
run vq16a_recon 2700 python scripts/vq16_loop.py recon --dir results_vq16a --ema

# --- Phase C: quality pipeline regen + two FID-vs-steps series.
run qp_data   1800 python scripts/quality_loop.py data
run qp_vq     5400 python scripts/quality_loop.py vq --steps 1500
run qp_recon  2700 python scripts/quality_loop.py recon
run qp_codes  2700 python scripts/quality_loop.py codes
run gptB100_train  2700 python scripts/quality_loop.py gpt \
    --gpt-dir gpt100 --steps 100 --ckpt-every 100
run gptB100_sample 3600 python scripts/quality_loop.py sample \
    --gpt-dir gpt100 --step 100
run gptB100_fid    1800 python scripts/quality_loop.py fid \
    --gpt-dir gpt100 --step 100
run gptB_train 10800 python scripts/quality_loop.py gpt \
    --steps 6000 --ckpt-every 1000
for s in 1000 3000 6000; do
    run gptB_sample$s 3600 python scripts/quality_loop.py sample --step $s
    run gptB_fid$s    1800 python scripts/quality_loop.py fid --step $s
done
run gptL100_train3  2700 python scripts/quality_loop.py gpt \
    --gpt-model GPT-L --gpt-dir gptL100 --steps 100 --ckpt-every 100
run gptL100_sample3 3600 python scripts/quality_loop.py sample \
    --gpt-model GPT-L --gpt-dir gptL100 --step 100
run gptL100_fid3    1800 python scripts/quality_loop.py fid \
    --gpt-dir gptL100 --step 100
run gptL_train3 10800 python scripts/quality_loop.py gpt \
    --gpt-model GPT-L --gpt-dir gptL --steps 6000 --ckpt-every 1000
for s in 1000 3000 6000; do
    run gptL_sample3_$s 3600 python scripts/quality_loop.py sample \
        --gpt-model GPT-L --gpt-dir gptL --step $s
    run gptL_fid3_$s 1800 python scripts/quality_loop.py fid \
        --gpt-dir gptL --step $s
done
run fid_merge3 600 python scripts/merge_fid_series.py

# --- Phase D: GPT-7B W4 ladder rows (verdict #2b).
run gpt7b_w4_kv8_r4 7200 python scripts/bench_serving.py offline GPT-7B \
    --batch 16 --weight-int4 --kv-int8
run gpt7b_w4_kv4_r4 7200 python scripts/bench_serving.py offline GPT-7B \
    --batch 32 --weight-int4 --kv-int4

# --- Phase E: fresh headline bench.
run bench3 3600 bash -c "python bench.py > $OUT/bench_chain3.json"

say "chain3 complete"
