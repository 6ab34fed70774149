#!/bin/bash
# CausalVideoVAE training
set -e
python -m video_llamagen_tpu.train.train_vae "$@"
