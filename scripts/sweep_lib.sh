#!/bin/bash
# Shared 3-seed sweep loop (analog of the reference's scripts/*/*.sh:
# skip finished output dirs, loop seeds 1..3, dotted-key CLI overrides).
# Usage: run_sweep <out_subdir> <cfg_path> <model> <extra --opts...>
run_sweep() {
    local OUT=$1 CFG=$2 MODEL=$3; shift 3
    local ROOT=${ROOT:-results}
    for SEED in 1 2 3; do
        local DIR=${ROOT}/${OUT}/${MODEL}/seed${SEED}
        if [ -d "$DIR" ]; then
            echo "results exist at ${DIR} (skipping)"
        else
            python -u main.py \
                --cfg "${CFG}" ${EXTRA_CFG} \
                --opts \
                model.name=${MODEL} \
                seed=${SEED} \
                output_dir=${DIR} \
                "$@"
        fi
    done
}
