#!/bin/bash
# Fetch the ImageNet-pretrained ResNet-D torch checkpoints the reference
# trains from (scripts/download_pretrianed_models.sh).  dcfp_tpu converts
# them on the fly (dcfp_tpu/models/convert.py: OIHW->HWIO, BN naming) when
# train.py is run with --pretrained auto.
set -e

mkdir -p "${DCFP_PRETRAINED_DIR:-pretrained_models}"
cd "${DCFP_PRETRAINED_DIR:-pretrained_models}"
wget -nc https://github.com/LikeLy-Journey/SegmenTron/releases/download/v0.1.0/resnet50-25c4b509.pth
wget -nc https://github.com/LikeLy-Journey/SegmenTron/releases/download/v0.1.0/resnet101-2a57e44d.pth
wget -nc https://github.com/LikeLy-Journey/SegmenTron/releases/download/v0.1.0/resnet152-0d43d698.pth
