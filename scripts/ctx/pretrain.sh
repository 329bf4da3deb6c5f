#!/bin/bash
# Pretrain with EIC accumulation — recipe parity with reference scripts/ctx/pretrain.sh,
# retargeted at the dcfp_tpu SPMD CLIs (one process drives the whole mesh;
# no torch.distributed.launch equivalent is needed).
set -e

DATASET='CTX'
MODEL_NAME='deeplabv3'
MODEL_PARA='{}'
BACKBONE='resnet50'
BACKBONE_PARA='{"os":8,"mg_unit":[1,1,1],"inplanes":128}'
INPUT_SIZE='480,480'
ALIGN_CORNER='false'
LONG_SIZE=512
SHORT_SIZE=-1
BS=16
LOSS_TYPE='ce'
LOSS_PARA='{"ds_weight":0.4}'
LEARNING_RATE=0.001
WEIGHT_DECAY=0.0001
WARMUP=-1
NUM_STEPS=3000
SAVE_PRED_EVERY=300
SNAPSHOT_DIR=ckpt/${DATASET}/dcfp_pretrain_${MODEL_NAME}

python -m dcfp_tpu.cli.train --dataset ${DATASET} --balance 0 \
    --model ${MODEL_NAME} --model-para ${MODEL_PARA} \
    --backbone ${BACKBONE} --backbone-para ${BACKBONE_PARA} \
    --loss-type ${LOSS_TYPE} --loss-para ${LOSS_PARA} \
    --random-mirror --random-brightness --random-scale \
    --longsize ${LONG_SIZE} --shortsize ${SHORT_SIZE} \
    --optim sgd --learning-rate ${LEARNING_RATE} --warmup ${WARMUP} \
    --weight-decay ${WEIGHT_DECAY} --num-steps ${NUM_STEPS} \
    --input-size ${INPUT_SIZE} --align-corner ${ALIGN_CORNER} \
    --batch-size ${BS} --random-seed 42 \
    --snapshot-dir ${SNAPSHOT_DIR} --save-pred-every ${SAVE_PRED_EVERY} \
    --save-steps $((NUM_STEPS - 3 * SAVE_PRED_EVERY)) \
    --prune-type dcfp --pretrained auto
