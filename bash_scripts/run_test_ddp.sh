#!/usr/bin/env bash
# Unconditional 50k-FID evaluation — name-compatible with the reference's
# bash_scripts/run_test_ddp.sh (torchrun, 8 GPUs). Here ONE single-controller
# JAX process shards generation over every TPU chip in the mesh; the
# counter-based sample RNG makes the generated set identical for any mesh
# shape. Multi-host pods: append --coordinator/--num_procs/--process_id.
# Usage: bash bash_scripts/run_test_ddp.sh test_args/<name>.txt <stats.npy> [inception.pth]
set -e
echo "Argument file: $1"
python -m lfm_tpu.cli.main fid --argfile "$1" --real_img_dir "$2" \
    --inception_ckpt "${3:-pt_inception-2015-12-05-6726825d.pth}" "${@:4}"
