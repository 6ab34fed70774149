#!/bin/bash
# Trained-pair speculative acceptance (round 5, VERDICT #4's last piece):
# rebuild the GPT-B draft on the same codes as the trained GPT-L target,
# then measure REAL acceptance + end-to-end spec-vs-plain (the fabricated
# rows are alpha=1 ceilings — zero-init heads make target==draft).
#
#   nohup bash scripts/chip_chain16.sh > results_chain/chain16.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=$PWD/results_chain
Q=$PWD/results_quality
say() { echo "[$(date -u +%H:%M:%S)] $*"; }
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

if [ ! -e "$Q/gpt/checkpoints/3000" ]; then
    run gptB_train_r5 3600 python scripts/quality_loop.py gpt \
        --gpt-model GPT-B --gpt-dir gpt --steps 3000 --ckpt-every 1000
fi
run spec_trained_r5 5400 python scripts/bench_spec.py trained \
    --target-orbax results_quality/gptL/checkpoints --target-step 3000 \
    --draft-orbax results_quality/gpt/checkpoints --draft-step 3000 \
    --batch 1 8 --k 4

say "chain16 complete"
