#!/bin/bash
# BN folded into the weight-quantizer static_scale instead of weight data
. "$(dirname "$0")/../../sweep_lib.sh"
CFG=${1:-minmax_channel}; MODEL=${2:-resnet18}; BITS=${3:-8}
run_sweep qat/into_scale/bias_correct/${CFG}/W${BITS} configs/runners/qat/bias_correct/${CFG}.yaml ${MODEL} \
    quant.default.weight.n_bits=${BITS} \
    quant.default.bn_folding.into_scale=True
