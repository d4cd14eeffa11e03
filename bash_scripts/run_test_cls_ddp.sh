#!/usr/bin/env bash
# Class-conditional (CFG) 50k-FID evaluation — name-compatible with the
# reference's bash_scripts/run_test_cls_ddp.sh (torchrun, 8 GPUs; ImageNet
# recipes). One JAX process shards generation over the mesh; CFG runs as a
# single fused 2N-batch forward. CFG scale comes from the argfile's CFG=
# key or the CFG env var (reference schema).
# Usage: bash bash_scripts/run_test_cls_ddp.sh test_args/imnet_dit.txt <stats.npy> [inception.pth]
set -e
echo "Argument file: $1"
source "$1"
python -m lfm_tpu.cli.main fid --argfile "$1" --real_img_dir "$2" \
    --inception_ckpt "${3:-pt_inception-2015-12-05-6726825d.pth}" \
    --num_classes 1000 --label_dropout 0.1 --cfg_scale "${CFG:-1.5}" "${@:4}"
