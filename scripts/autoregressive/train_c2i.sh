#!/bin/bash
# c2i GPT training (ref scripts/autoregressive/train_c2i.sh surface).
# DDP/FSDP/TP all via mesh flags: --data N --fsdp N --tp N.
set -e
python -m video_llamagen_tpu.train.train_c2i "$@"
