#!/bin/bash
# VQ-GAN tokenizer training (ref scripts/tokenizer/train_vq.sh)
set -e
python -m video_llamagen_tpu.train.train_vq "$@"
