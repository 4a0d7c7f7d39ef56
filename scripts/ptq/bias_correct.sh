#!/bin/bash
. "$(dirname "$0")/../sweep_lib.sh"
CFG=$1; MODEL=$2; BITS=$3
run_sweep ptq/bias_correct/${CFG}/W${BITS} configs/runners/ptq/bias_correct/${CFG}.yaml ${MODEL} \
    quant.default.weight.n_bits=${BITS}
