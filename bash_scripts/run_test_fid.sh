#!/usr/bin/env bash
# 50k-FID evaluation — replaces the reference's torchrun 8-GPU harness
# (bash_scripts/run_test_ddp.sh): one single-controller JAX process shards
# generation over every TPU chip in the mesh automatically.
# Usage: bash bash_scripts/run_test_fid.sh test_args/<name>.txt <stats.npy> <inception.pth>
set -e
echo "Argument file: $1"
python -m lfm_tpu.cli.main fid --argfile "$1" --real_img_dir "$2" \
    --inception_ckpt "${3:-pt_inception-2015-12-05-6726825d.pth}" "${@:4}"
