#!/bin/bash
. "$(dirname "$0")/../sweep_lib.sh"
MODEL=${1:-resnet18}; BITS=${2:-8}
run_sweep ptq/awq/W${BITS} configs/runners/ptq/awq/rn18_w8.yaml ${MODEL} \
    quant.default.weight.n_bits=${BITS}
