#!/bin/bash
# Usage: $0 <cfg-name e.g. mse_channel> <model> <bits>
. "$(dirname "$0")/../sweep_lib.sh"
CFG=$1; MODEL=$2; BITS=$3
KEY=weight; [ "weight_quantize" = activation_quantize ] && KEY=activation
run_sweep ptq/weight_quantize/${CFG}/B${BITS} configs/runners/ptq/weight_quantize/${CFG}.yaml ${MODEL} \
    quant.default.${KEY}.n_bits=${BITS}
