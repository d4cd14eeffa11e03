#!/usr/bin/env bash
# Class-conditional (CFG) sampling — reference bash_scripts/run_test_cls.sh.
set -e
source "$1"
python -m lfm_tpu.cli.main sample --argfile "$1" \
    --num_classes 1000 --label_dropout 0.1 --cfg_scale "${CFG:-1.5}" "${@:2}"
