#!/bin/bash
set -e
python -m video_llamagen_tpu.train.train_t2i "$@"
