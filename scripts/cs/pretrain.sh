#!/bin/bash
# Pretrain with EIC accumulation — recipe parity with reference scripts/cs/pretrain.sh,
# retargeted at the dcfp_tpu SPMD CLIs (one process drives the whole mesh;
# no torch.distributed.launch equivalent is needed).
set -e

DATASET='CS'
MODEL_NAME='deeplabv3'
MODEL_PARA='{}'
BACKBONE='resnet50'
BACKBONE_PARA='{"os":8,"mg_unit":[1,2,4],"inplanes":128}'
INPUT_SIZE='769,769'
ALIGN_CORNER='true'
LONG_SIZE=-1
SHORT_SIZE=-1
BS=8
LOSS_TYPE='ce'
LOSS_PARA='{"ds_weight":0.4}'
LEARNING_RATE=0.01
WEIGHT_DECAY=0.0005
WARMUP=-1
NUM_STEPS=4000
SAVE_PRED_EVERY=800
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
    --prune-type dcfp --pretrained auto \
    --xla-options xla_tpu_scoped_vmem_limit_kib=49152
# the --xla-options value is measured for THIS recipe shape (batch 8 @769²,
# R50 os8): 197.6 vs 201.7 ms/step — see docs/ROADMAP.md; drop it for
# other shapes unless re-measured (tools/exp_train.py "opt:...")
