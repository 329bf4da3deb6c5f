#!/bin/bash
# Multi-host (TPU pod) variant of the Cityscapes pretrain recipe.
# Run THIS SAME script on every host of the pod slice (e.g. via
# `gcloud compute tpus tpu-vm ssh ... --worker=all --command=...`).
# jax.distributed discovers the coordinator and process ids from the TPU
# environment; --batch-size stays GLOBAL and is divided across processes
# (reference engine.py:81: batch //= world_size).
#
# For a manual CPU/GPU bring-up, add:
#   --coordinator <host:port> --num-processes <N> --process-id <i>

set -e
cd "$(dirname "$0")/../.."

python -m dcfp_tpu.cli.train \
    --distributed true \
    --dataset CS --data-dir train \
    --model deeplabv3 --backbone resnet50 \
    --backbone-para '{"os":8,"mg_unit":[1,2,4],"inplanes":128}' \
    --input-size 769,769 --batch-size 8 --num-steps 4000 \
    --learning-rate 0.01 --momentum 0.9 --weight-decay 5e-4 \
    --random-mirror --random-scale --random-brightness \
    --loss-type ce --deepsup true --prune-type dcfp \
    --num-workers 4 \
    --compute-dtype bfloat16 \
    --snapshot-dir snapshots/cs_pretrain_pod "$@"
