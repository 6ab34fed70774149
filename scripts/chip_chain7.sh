#!/bin/bash
# Round-4 CONSOLIDATED chip chain (replaces the chain3->4->5->6 cascade,
# whose queue order buried the high-value rows hours behind the FID
# series). Reuses the same done-markers, so rows already completed by the
# earlier chains skip. Value order:
#
#   vq16a_recon_raw  VERDICT #1 evidence: the --ema recon read 16.04 dB
#                    because ema_decay 0.9999 has a ~10k-step time constant
#                    (a 4k-step run's EMA is still mostly the random init);
#                    train rec loss ~0.006 => raw weights should read ~22 dB.
#   qp_codes         fresh VQ-8 codes (prereq for every GPT quality row).
#   probe_s4         the int4-KV dispatch/bandwidth/packing answer (V#2a).
#   online_*_r4      TTFT re-rows with the FIXED engine (V#3) — the chain1
#                    rows at 18:31 ran the PRE-fix engine (fix landed 00:01).
#   spec_b32         frozen-cache speculative serving at batch 32 (V#4).
#   gptL FID series  the missing series of the 2-series figure (V#2c).
#   kvgate_*         int4/int8 KV quality gate on the trained GPT-L (V#8).
#   gpt7b_*          GPT-7B W4 ladder retry (V#2b; chain2's rows predate the
#                    layer-sequential fabrication fix in 87a736f).
#   t2i_*            closed t2i caption-control loop (V#5).
#   gptB refresh     re-measure the GPT-B series on the SAME fresh codes
#                    (lowest value: an old-codes series is already recorded).
#
#   nohup bash scripts/chip_chain7.sh > results_chain/chain7.log 2>&1 &
#   echo $! > results_chain/chain7.pid
#
# Stop cleanly: touch results_chain/STOP (never SIGKILL a TPU client).

set -u
cd "$(dirname "$0")/.."
OUT=$PWD/results_chain
mkdir -p "$OUT"
DEADLINE=$(( $(date +%s) + 4*3600 ))   # stop STARTING rows after 4 h

say() { echo "[$(date -u +%H:%M:%S)] $*"; }

# Wait for the old cascade (chain3/4/5) to drain — they exit on the STOP
# file placed before this chain was launched; chain3 finishes its in-flight
# row first. Then CLEAR the STOP file so this chain runs.
for c in chain3 chain4 chain5; do
    if [ -f "$OUT/$c.pid" ]; then
        P=$(cat "$OUT/$c.pid")
        while kill -0 "$P" 2>/dev/null; do
            say "$c (pid $P) still draining; sleeping 60s"
            sleep 60
        done
    fi
done
rm -f "$OUT/STOP"
say "old chains drained; starting chain7"

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

# --- P0: quick verdict-closers ------------------------------------------
run vq16a_recon_raw 2700 python scripts/vq16_loop.py recon --dir results_vq16a
run qp_codes  2700 python scripts/quality_loop.py codes
# qp_recon retry: the 00:44 run recorded PSNR 26.2 then died on a tunnel
# transient (remote_compile body closed) during the rfid pass.
run qp_recon_r2 2700 python scripts/quality_loop.py recon
run probe_s4  3600 python scripts/probe_s4_layout.py A C B
run online_b64_r4 5400 python scripts/bench_serving.py online GPT-L \
    --batch 64 --kv-int8 --rates 2 4 8 16 --num-requests 96
run online_b32_r4 3600 python scripts/bench_serving.py online GPT-L \
    --batch 32 --kv-int8 --rates 2 4 8 16 --num-requests 64
run spec_b32 5400 python scripts/bench_serving.py offline GPT-L \
    --batch 32 --draft-model GPT-B --spec-k 4

# --- P1: GPT-L FID-vs-steps series (missing half of the 2-series figure) -
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

# --- P2: int4/int8 KV quality gate on the trained GPT-L (V#8) ------------
run kvgate_greedy 5400 python scripts/kv_quality_gate.py greedy
for kv in bf16 int8 int4; do
    run kvgate_sample_$kv 5400 python scripts/kv_quality_gate.py sample --kv $kv
    run kvgate_fid_$kv    1800 python scripts/kv_quality_gate.py fid --kv $kv
done

# --- P3: GPT-7B W4 ladder (V#2b) ------------------------------------------
run gpt7b_w4_kv8_r4 7200 python scripts/bench_serving.py offline GPT-7B \
    --batch 16 --weight-int4 --kv-int8
run gpt7b_w4_kv4_r4 7200 python scripts/bench_serving.py offline GPT-7B \
    --batch 32 --weight-int4 --kv-int4

# --- P4: t2i caption-control loop (V#5) ----------------------------------
run t2i_data   900  python scripts/t2i_quality.py data
run t2i_train  7200 python scripts/t2i_quality.py train --steps 3000
run t2i_sample_trained 5400 python scripts/t2i_quality.py sample --tag trained
run t2i_sample_random  5400 python scripts/t2i_quality.py sample --tag random_init
run t2i_sample_uncond  5400 python scripts/t2i_quality.py sample --tag uncond
run t2i_score  3600 python scripts/t2i_quality.py score

# --- P5: GPT-B series refresh on the fresh codes (lowest value) ----------
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
run fid_merge4 600 python scripts/merge_fid_series.py

# --- final: fresh headline bench ------------------------------------------
run bench7 3600 bash -c "python bench.py > $OUT/bench_chain7.json"

say "chain7 complete"
