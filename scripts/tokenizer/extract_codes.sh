#!/bin/bash
set -e
python -m video_llamagen_tpu.train.extract_codes "$@"
