#!/bin/bash
# One-command north-star parity (BASELINE.md: pruned model within
# 0.3 mIoU of the reference at equal FLOPs).
#
#   DCFP_DATA_ROOT=/path/to/data tools/parity.sh cs [ref_result.txt]
#
# Runs the full dcfp_tpu recipe (label_index -> pretrain+EIC -> prune ->
# finetune -> ss + ms eval) for the dataset, then — if a reference-side
# result.txt is given — diffs the per-protocol mIoU against it.
# Reference-side commands: `python tools/parity.py ref-commands`.
set -e
cd "$(dirname "$0")/.."

DS_RAW=${1:?usage: tools/parity.sh <cs|ade|ctx|coco> [ref_result.txt]}
DS=$(echo "$DS_RAW" | tr '[:lower:]' '[:upper:]')
REF=$2
WORK=ckpt/parity_${DS}

python tools/parity.py tpu --dataset "$DS" --work-dir "$WORK" \
    --pretrained auto "${@:3}"

if [ -n "$REF" ]; then
    python tools/parity.py compare "$WORK/result.txt" "$REF" --tol 0.3
else
    echo "reference side not provided; to produce it:"
    python tools/parity.py ref-commands --dataset "$DS"
fi
