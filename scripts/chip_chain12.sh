#!/bin/bash
# Round-5 chain: ARTIFACT-EXISTENCE gating (VERDICT r4 next-step #3).
#
# Rows no longer gate on git-tracked .done markers — the round-4 VM wipe
# proved those lie (markers survived, artifacts didn't, 14 rows cascaded,
# and 7 committed kvgate markers claimed runs that never happened). Every
# row here declares needs= (input artifacts; row skips with a loud message
# if missing) and produces= (output artifacts / json keys; row is a no-op
# iff THOSE exist). Re-running a satisfied chain is a no-op because the
# artifacts say so.
#
# Correction vs chip_chain11.sh's header claim (ADVICE r4): "bf16 KV at
# batch 8 fits" was refuted on-chip — the OOM is 64 PADDED HLO temps
# (bf16[16,32,577,128] in layout {0,3,1,2}: batch in the 128-lane dim, 8x),
# not cache-vs-weights arithmetic. The fix is the merged (B*KH, S, D)
# cache layout (models/gpt.init_kv_cache_merged), first rows below.
#
#   nohup bash scripts/chip_chain12.sh > results_chain/chain12.log 2>&1 &
#   echo $! > results_chain/chain12.pid
#
# Stop cleanly: touch results_chain/STOP (never SIGKILL a TPU client).

set -u
cd "$(dirname "$0")/.."
OUT=$PWD/results_chain
Q=$PWD/results_quality
T2I=$PWD/results_t2i
T2V=$PWD/results_t2v/quality
mkdir -p "$OUT"
DEADLINE=$(( $(date +%s) + 21600 ))   # stop STARTING rows after 6 h

say() { echo "[$(date -u +%H:%M:%S)] $*"; }

# ---- wait for a predecessor chain (opt-in via CHAIN_WAIT_PID) -----------
# NOTE: pid-files of EXITED chains must not be waited on — pid reuse once
# matched a pytest worker and stalled the handoff 48 min. Callers pass the
# live predecessor pid explicitly.
if [ -n "${CHAIN_WAIT_PID:-}" ]; then
    while kill -0 "$CHAIN_WAIT_PID" 2>/dev/null; do
        say "predecessor ($CHAIN_WAIT_PID) still running; sleeping 60s"
        sleep 60
    done
    say "predecessor exited"
fi
rm -f "$OUT/STOP"

probe_tpu() {
    timeout 240 python -c \
      "import jax; assert jax.default_backend() == 'tpu'" 2>/dev/null
}

wait_for_tpu() {
    while true; do
        [ -f "$OUT/STOP" ] && { say "STOP file — exiting"; exit 0; }
        [ "$(date +%s)" -ge "$DEADLINE" ] && { say "deadline — exiting"; exit 0; }
        if probe_tpu; then return 0; fi
        say "tunnel down; sleeping 300s"
        sleep 300
    done
}

# Artifact spec: a path, or jsonkey:FILE:KEY (key present in the json
# table), or jsonkey:FILE:KEY:FIELD (present AND .FIELD non-null).
art() {
    case "$1" in
        jsonkey:*)
            python - "$1" <<'EOF'
import json, sys
parts = sys.argv[1].split(":")
file, key = parts[1], parts[2]
field = parts[3] if len(parts) > 3 else None
try:
    t = json.load(open(file))
except Exception:
    sys.exit(1)
if key not in t:
    sys.exit(1)
if field is not None and (not isinstance(t[key], dict)
                          or t[key].get(field) is None):
    sys.exit(1)
sys.exit(0)
EOF
            ;;
        *) [ -e "$1" ] ;;
    esac
}

# row TAG TIMEOUT needs=a,b produces=c,d -- cmd args...
row() {
    local tag=$1 tmo=$2; shift 2
    local needs="" prods="" a
    while [ "$1" != "--" ]; do
        case "$1" in
            needs=*)    needs="${1#needs=}" ;;
            produces=*) prods="${1#produces=}" ;;
        esac
        shift
    done
    shift
    if [ -n "$prods" ]; then
        local have=1
        for a in ${prods//,/ }; do art "$a" || { have=0; break; }; done
        [ "$have" = 1 ] && { say "skip $tag (artifacts exist)"; return 0; }
    fi
    for a in ${needs//,/ }; do
        art "$a" || { say "SKIP $tag: missing needed artifact $a"; return 1; }
    done
    [ -f "$OUT/STOP" ] && { say "STOP file — exiting"; exit 0; }
    [ "$(date +%s)" -ge "$DEADLINE" ] && { say "deadline — exiting"; exit 0; }
    wait_for_tpu
    say "=== $tag (timeout ${tmo}s) ==="
    if timeout "$tmo" "$@" >> "$OUT/$tag.log" 2>&1; then
        say "$tag OK"
    else
        say "$tag FAILED rc=$? (log: results_chain/$tag.log)"
    fi
    for a in ${prods//,/ }; do
        art "$a" || say "WARN $tag: expected artifact $a not produced"
    done
}

BSO=$PWD/bench_serving_offline.json
QT=$Q/quality_table.json

# --- P0: GPT-7B ladder tail (chain13 ran the working configs) ------------
# The original --weight-int4 (s4) rows crash at dispatch (eager-relayout
# recursion; CLAUDE.md s4 hazard) — chain13's w8/w4p rows supersede them.
# Remaining rung: w8 at batch 16 (6.5G weights + 4.7G merged int8 KV fits).
row gpt7b_w8_kv8_kvm_b16 5400 needs=jsonkey:$BSO:GPT-7B_w8_kv8_kvm \
    produces=jsonkey:$BSO:GPT-7B_w8_kv8_kvm_b16 -- \
    python scripts/bench_serving.py offline GPT-7B --batch 16 \
        --weight-int8 --kv-int8 --kv-merged

# --- P1: finish the gptL100 FID point (series half, VERDICT #2a) ---------
row gptL100_sample 5400 \
    needs=$Q/gptL100/checkpoints/100,$Q/checkpoints/1500 \
    produces=$Q/samples_gptL100_step100.npz -- \
    python scripts/quality_loop.py sample --gpt-model GPT-L \
        --gpt-dir gptL100 --step 100
row gptL100_fid 2700 \
    needs=$Q/samples_gptL100_step100.npz,$Q/ref_batch.npz \
    produces=jsonkey:$QT:gptL100_step100 -- \
    python scripts/quality_loop.py fid --gpt-dir gptL100 --step 100
row fid_merge_a 600 needs= produces= -- python scripts/merge_fid_series.py

# --- P2: spec-vs-plain apples-to-apples (VERDICT #4) ---------------------
# Plain GPT-L rows at the batches spec was/will be measured at, then spec
# rows (now recording spec_alpha — engine folds offline acceptance counts).
row gptL_plain_b16 3600 needs= produces=jsonkey:$BSO:GPT-L_b16 -- \
    python scripts/bench_serving.py offline GPT-L --batch 16
row gptL_plain_b32 3600 needs= produces=jsonkey:$BSO:GPT-L_b32 -- \
    python scripts/bench_serving.py offline GPT-L --batch 32
row gptL_spec_b8 5400 needs= \
    produces=jsonkey:$BSO:GPT-L_spec4_GPT-B:spec_alpha -- \
    python scripts/bench_serving.py offline GPT-L --batch 8 \
        --draft-model GPT-B --spec-k 4
row gptL_spec_b32 5400 needs= \
    produces=jsonkey:$BSO:GPT-L_b32_spec4_GPT-B:spec_alpha -- \
    python scripts/bench_serving.py offline GPT-L --batch 32 \
        --draft-model GPT-B --spec-k 4

# --- P8: adaptive-window online serving (VERDICT #5) ---------------------
# Baseline: static w16 at 16 req/s = 1,104 tok/s, TTFT p50 1.59 s
# (GPT-L_b64_w16_r16.0_kv8). Adaptive: same engine + max_window 128 —
# windows grow 16->128 only at full occupancy, so TTFT should hold while
# the per-window tunnel syncs drop ~8x at saturation.
BON=$PWD/bench_serving_online.json
row online_adaptive_b64 10800 needs= \
    produces=jsonkey:$BON:GPT-L_b64_w16m128_r16.0_kv8 -- \
    python scripts/bench_serving.py online GPT-L --batch 64 --kv-int8 \
        --decode-window 16 --max-window 128 --rates 8 16 \
        --num-requests 96
row online_adaptive_b64_r32 7200 \
    needs=jsonkey:$BON:GPT-L_b64_w16m128_r16.0_kv8 \
    produces=jsonkey:$BON:GPT-L_b64_w16m128_r32.0_kv8 -- \
    python scripts/bench_serving.py online GPT-L --batch 64 --kv-int8 \
        --decode-window 16 --max-window 128 --rates 32 \
        --num-requests 192

# GPT-7B ONLINE (merged int8 KV + w8 now serve through continuous
# batching): first online row for the zoo's top rung.
row online_7b_b8 7200 needs=jsonkey:$BSO:GPT-7B_w8_kv8_kvm \
    produces=jsonkey:$BON:GPT-7B_b8_w16m64_r1.0_kv8 -- \
    python scripts/bench_serving.py online GPT-7B --batch 8 --weight-int8 \
        --kv-int8 --kv-merged --decode-window 16 --max-window 64 \
        --rates 1 --num-requests 24

# --- P4: gptL 3000-step rebuild (FID tail + kvgate dependency) -----------
row gptL_train 10800 needs=$Q/codes/imagenet64_codes \
    produces=$Q/gptL/checkpoints/3000 -- \
    python scripts/quality_loop.py gpt --gpt-model GPT-L --gpt-dir gptL \
        --steps 3000 --ckpt-every 1000
row gptL_sample_3000 5400 \
    needs=$Q/gptL/checkpoints/3000,$Q/checkpoints/1500 \
    produces=$Q/samples_gptL_step3000.npz -- \
    python scripts/quality_loop.py sample --gpt-model GPT-L \
        --gpt-dir gptL --step 3000
row gptL_fid_3000 2700 \
    needs=$Q/samples_gptL_step3000.npz,$Q/ref_batch.npz \
    produces=jsonkey:$QT:gptL_step3000 -- \
    python scripts/quality_loop.py fid --gpt-dir gptL --step 3000
row fid_merge_b 600 needs= produces= -- python scripts/merge_fid_series.py

# --- P6: gptL 1000-step FID point (completes the 3-point series) ---------
row gptL_sample_1000 5400 \
    needs=$Q/gptL/checkpoints/1000,$Q/checkpoints/1500 \
    produces=$Q/samples_gptL_step1000.npz -- \
    python scripts/quality_loop.py sample --gpt-model GPT-L \
        --gpt-dir gptL --step 1000
row gptL_fid_1000 2700 \
    needs=$Q/samples_gptL_step1000.npz,$Q/ref_batch.npz \
    produces=jsonkey:$QT:gptL_step1000 -- \
    python scripts/quality_loop.py fid --gpt-dir gptL --step 1000
row fid_merge_c 600 needs= produces= -- python scripts/merge_fid_series.py

# --- P3: t2i caption-control loop (VERDICT #2b; codes rebuilt by ch11) ---
row t2i_data 1800 needs= produces=$T2I/caption_feats.npy -- \
    python scripts/t2i_quality.py data
row t2i_train 9000 \
    needs=$T2I/caption_feats.npy,$Q/codes/imagenet64_codes \
    produces=$T2I/checkpoints/3000 -- \
    python scripts/t2i_quality.py train --steps 3000
row t2i_sample_trained 7200 \
    needs=$T2I/checkpoints/3000,$Q/checkpoints/1500 \
    produces=$T2I/samples_trained.npy -- \
    python scripts/t2i_quality.py sample --tag trained
row t2i_sample_random 7200 needs=$Q/checkpoints/1500 \
    produces=$T2I/samples_random_init.npy -- \
    python scripts/t2i_quality.py sample --tag random_init
row t2i_sample_uncond 7200 \
    needs=$T2I/checkpoints/3000,$Q/checkpoints/1500 \
    produces=$T2I/samples_uncond.npy -- \
    python scripts/t2i_quality.py sample --tag uncond
row t2i_score 3600 \
    needs=$T2I/samples_trained.npy,$Q/ref_batch.npz \
    produces=jsonkey:$T2I/quality_table.json:trained -- \
    python scripts/t2i_quality.py score

# --- P5: KV quality gates on the trained GPT-L (VERDICT #2c) -------------
# chain11 ran these against a nonexistent step-6000 checkpoint (ADVICE r4);
# explicit --step 3000 against the P4 rebuild.
KVG=$Q/kv_gate.json
row kvgate_greedy 5400 needs=$Q/gptL/checkpoints/3000 \
    produces=jsonkey:$KVG:greedy_match -- \
    python scripts/kv_quality_gate.py greedy --step 3000
for kv in bf16 int8 int4; do
    row kvgate_sample_$kv 7200 \
        needs=$Q/gptL/checkpoints/3000,$Q/checkpoints/1500 \
        produces=$Q/kv_gate_samples_$kv.npz -- \
        python scripts/kv_quality_gate.py sample --kv $kv --step 3000
    row kvgate_fid_$kv 2700 \
        needs=$Q/kv_gate_samples_$kv.npz,$Q/ref_batch.npz \
        produces=jsonkey:$KVG:fid_$kv -- \
        python scripts/kv_quality_gate.py fid --kv $kv --step 3000
done

# --- P7: t2v second scale point — GPT-L trunk (VERDICT #6) ---------------
row t2v_data 1800 needs= produces=$T2V/train_clips.npy -- \
    python scripts/t2v_quality.py data
row t2v_latents 3600 \
    needs=$T2V/train_clips.npy,results_vae_ms2/checkpoints \
    produces=$T2V/train_latents.npy -- \
    python scripts/t2v_quality.py latents
row t2v_train_l 10800 needs=$T2V/train_latents.npy \
    produces=$T2V/gpt_diff_l/params.npy -- \
    python scripts/t2v_quality.py train --gpt-model GPT-L --head diff \
        --steps 3000
row t2v_sample_l 7200 needs=$T2V/gpt_diff_l/params.npy \
    produces=$T2V/samples_diff_l.npy -- \
    python scripts/t2v_quality.py sample --gpt-model GPT-L --head diff
row t2v_sample_l_uncond 7200 needs=$T2V/gpt_diff_l/params.npy \
    produces=$T2V/samples_diff_l_uncond.npy -- \
    python scripts/t2v_quality.py sample --gpt-model GPT-L --head diff \
        --uncond
row t2v_score_l 3600 needs=$T2V/samples_diff_l.npy \
    produces=jsonkey:$T2V/quality_table.json:diff_l -- \
    python scripts/t2v_quality.py score --tags diff_l diff_l_uncond

# --- P9: trained-pair speculative acceptance (VERDICT #4) ----------------
# Real alpha needs target+draft trained on the SAME codes: GPT-L@3000 (P4)
# + a rebuilt GPT-B draft (the round-2 gpt/ checkpoints were wiped).
row gptB_train 7200 needs=$Q/codes/imagenet64_codes \
    produces=$Q/gpt/checkpoints/3000 -- \
    python scripts/quality_loop.py gpt --gpt-model GPT-B --gpt-dir gpt \
        --steps 3000 --ckpt-every 1000
row spec_trained 7200 \
    needs=$Q/gptL/checkpoints/3000,$Q/gpt/checkpoints/3000 \
    produces=jsonkey:results_spec/spec_report.json:trained_b8 -- \
    python scripts/bench_spec.py trained \
        --target-orbax results_quality/gptL/checkpoints --target-step 3000 \
        --draft-orbax results_quality/gpt/checkpoints --draft-step 3000 \
        --batch 1 8 --k 4

# --- final: fresh headline bench -----------------------------------------
row bench12 3600 needs= produces= -- \
    bash -c "python bench.py > $OUT/bench_chain12.json"

say "chain12 complete"
