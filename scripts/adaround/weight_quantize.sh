#!/bin/bash
. "$(dirname "$0")/../sweep_lib.sh"
CFG=${1:-mse_channel}; MODEL=${2:-resnet18}; BITS=${3:-4}
SUB=weight_quantize/${CFG}; [ "weight_quantize" = awq ] && SUB=awq/rn18_w8 && CFG=rn18_w8
run_sweep adaround/weight_quantize/${CFG}/W${BITS} configs/runners/adaround/${SUB}.yaml ${MODEL} \
    quant.default.weight.n_bits=${BITS}
