#!/bin/bash
# Deploy: BN-fold + bf16 AOT compile + latency — recipe parity with reference scripts/coco/trt.sh,
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
FT_DIR=ckpt/${DATASET}/dcfp_finetune_${MODEL_NAME}
PRUNE_DIR=ckpt/${DATASET}/dcfp_pretrain_${MODEL_NAME}/dcfp_prune_06

python -m dcfp_tpu.cli.deploy --dataset ${DATASET} \
    --model ${MODEL_NAME} --model-para ${MODEL_PARA} \
    --backbone ${BACKBONE} --backbone-para ${BACKBONE_PARA} \
    --align-corner ${ALIGN_CORNER} --input-size 512,512 \
    --restore-from ${FT_DIR}/${DATASET}_scenes_54000.msgpack \
    --channel-cfg ${PRUNE_DIR}/channel_cfg.msgpack \
    --save-dir ${FT_DIR}/deploy

# serve the serialized executable through the evaluator (--use-trt analog)
python -m dcfp_tpu.cli.evaluate --dataset ${DATASET} --data-dir val \
    --model ${MODEL_NAME} --backbone ${BACKBONE} \
    --backbone-para ${BACKBONE_PARA} --batch-size 1 \
    --whole true --flip false --input-size 512,512 \
    --align-corner ${ALIGN_CORNER} --ms '1' --dtype bfloat16 \
    --restore-from ${FT_DIR}/${DATASET}_scenes_54000.msgpack \
    --channel-cfg ${PRUNE_DIR}/channel_cfg.msgpack
