#!/bin/bash
set -e
python -m video_llamagen_tpu.inference.sample_t2i "$@"
