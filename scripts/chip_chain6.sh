#!/bin/bash
# Round-4 chain, stage 4: runs AFTER scripts/chip_chain5.sh.
# t2v quality loop at a SECOND scale point (VERDICT r3 #6): GPT-L trunk
# through the same captioned-clip loop (64px/9f, results_vae_ms2 VAE).
# data/latents are deterministic regenerations (round restarts wipe npys);
# the GPT-B row's numbers are already recorded in quality_table.json.
#
#   nohup bash scripts/chip_chain6.sh > results_chain/chain6.log 2>&1 &
#   echo $! > results_chain/chain6.pid

set -u
cd "$(dirname "$0")/.."
OUT=$PWD/results_chain
mkdir -p "$OUT"
DEADLINE=$(( $(date +%s) + 24*3600 ))

say() { echo "[$(date -u +%H:%M:%S)] $*"; }

if [ -f "$OUT/chain5.pid" ]; then
    P=$(cat "$OUT/chain5.pid")
    while kill -0 "$P" 2>/dev/null; do
        [ -f "$OUT/STOP" ] && { say "STOP — exiting"; exit 0; }
        say "chain5 (pid $P) still running; sleeping 300s"
        sleep 300
    done
fi
say "chain5 done; starting chain6"

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

run t2v_data2    1800 python scripts/t2v_quality.py data
run t2v_latents2 3600 python scripts/t2v_quality.py latents
run t2vL_train  14400 python scripts/t2v_quality.py train \
    --gpt-model GPT-L --head diff --steps 3000
run t2vL_sampleall 14400 python scripts/t2v_quality.py sampleall \
    --gpt-model GPT-L --head diff --tags diff_l random diff_l_uncond

# fresh headline bench at the very end of the round's chip work
run bench_final 3600 bash -c "python bench.py > $OUT/bench_final.json"

say "chain6 complete"
