#!/bin/bash
# t2v training (ref train_t2v.sh); --video-head {mse,diff,mask_diff,mask_mse}
set -e
python -m video_llamagen_tpu.train.train_t2v "$@"
