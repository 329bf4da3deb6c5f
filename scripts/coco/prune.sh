#!/bin/bash
# FLOPs-targeted DCFP prune — recipe parity with reference scripts/coco/prune.sh,
# retargeted at the dcfp_tpu SPMD CLIs (one process drives the whole mesh;
# no torch.distributed.launch equivalent is needed).
set -e

DATASET='COCO'
MODEL_NAME='deeplabv3'
MODEL_PARA='{}'
BACKBONE='resnet50'
BACKBONE_PARA='{"mg_unit":[1,1,1]}'
INPUT_SIZE='512,512'
ALIGN_CORNER='false'
LONG_SIZE=-1
SHORT_SIZE=512
PRUNE_RATIO=0.6
PRETRAIN_DIR=ckpt/${DATASET}/dcfp_pretrain_${MODEL_NAME}
SNAPSHOT_DIR=${PRETRAIN_DIR}/dcfp_prune_06

python -m dcfp_tpu.cli.prune --dataset ${DATASET} \
    --model ${MODEL_NAME} --model-para ${MODEL_PARA} \
    --backbone ${BACKBONE} --backbone-para ${BACKBONE_PARA} \
    --align-corner ${ALIGN_CORNER} --prune-ratio ${PRUNE_RATIO} \
    --save-path ${SNAPSHOT_DIR} \
    --model-path ${PRETRAIN_DIR}/${DATASET}_scenes_6000.msgpack \
    --score-path ${PRETRAIN_DIR}/score.msgpack
