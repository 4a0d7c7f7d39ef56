#!/bin/bash
. "$(dirname "$0")/../sweep_lib.sh"
CFG=${1:-minmax_channel}; MODEL=${2:-resnet18}; BITS=${3:-8}
run_sweep qat/bias_correct/${CFG}/W${BITS} configs/runners/qat/bias_correct/${CFG}.yaml ${MODEL} \
    quant.default.weight.n_bits=${BITS}
