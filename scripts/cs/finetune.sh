#!/bin/bash
# Long-tail finetune of the pruned model — recipe parity with reference scripts/cs/finetune.sh,
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
LOSS_TYPE='gsrl'
LOSS_PARA='{"ds_weight":0.4}'
LEARNING_RATE=0.01
WEIGHT_DECAY=0.001
WARMUP=1000
NUM_STEPS=36000
SAVE_PRED_EVERY=800
PRUNE_DIR=ckpt/${DATASET}/dcfp_pretrain_${MODEL_NAME}/dcfp_prune_06
SNAPSHOT_DIR=ckpt/${DATASET}/dcfp_finetune_${MODEL_NAME}
CHANNEL_CFG=${PRUNE_DIR}/channel_cfg.msgpack

python -m dcfp_tpu.cli.train --dataset ${DATASET} --balance 2 --resample true \
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
    --save-steps $((NUM_STEPS - 7 * SAVE_PRED_EVERY)) \
    --resume ${PRUNE_DIR}/pruned.msgpack --channel-cfg ${CHANNEL_CFG} \
    --xla-options xla_tpu_scoped_vmem_limit_kib=49152
# --xla-options measured for this recipe shape (batch 8 @769²): see
# docs/ROADMAP.md; drop for other shapes unless re-measured

# ss test
python -m dcfp_tpu.cli.evaluate --dataset ${DATASET} --data-dir val \
    --model ${MODEL_NAME} --backbone ${BACKBONE} \
    --backbone-para ${BACKBONE_PARA} --batch-size 1 \
    --longsize ${LONG_SIZE} --shortsize ${SHORT_SIZE} \
    --whole true --flip false --input-size ${INPUT_SIZE} \
    --align-corner ${ALIGN_CORNER} --ms '1' \
    --restore-from ${SNAPSHOT_DIR}/${DATASET}_scenes_${NUM_STEPS}.msgpack \
    --channel-cfg ${CHANNEL_CFG}

# ms test
python -m dcfp_tpu.cli.evaluate --dataset ${DATASET} --data-dir val \
    --model ${MODEL_NAME} --backbone ${BACKBONE} \
    --backbone-para ${BACKBONE_PARA} --batch-size 1 \
    --longsize ${LONG_SIZE} --shortsize ${SHORT_SIZE} \
    --whole true --flip true --input-size ${INPUT_SIZE} \
    --align-corner ${ALIGN_CORNER} --ms '0.5,0.75,1,1.25,1.5,1.75' \
    --restore-from ${SNAPSHOT_DIR}/${DATASET}_scenes_${NUM_STEPS}.msgpack \
    --channel-cfg ${CHANNEL_CFG}
