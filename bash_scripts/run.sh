#!/usr/bin/env bash
# Training recipes — mirrors the reference's bash_scripts/run.sh registry
# (the de-facto hyperparameter table). Uncomment one block to train.
# Data parallelism: no accelerate/torchrun needed — the jitted train step
# shards the global batch over all visible TPU chips.

############################### DiT-L/2 ~ CelebA 256 ###############################
# python -m lfm_tpu.cli.main train --preset celeb256_dit \
#     --datadir data/celeba/celeba-lmdb --vae_ckpt sd-vae-ft-mse.bin \
#     --batch_size 32 --num_epoch 500 --lr 2e-4 --no_lr_decay \
#     --use_ema --save_content --save_content_every 10

############################### DiT-B/2 ~ ImageNet 256 #############################
# python -m lfm_tpu.cli.main train --preset imnet_dit \
#     --datadir data/imagenet --vae_ckpt sd-vae-ft-mse.bin \
#     --batch_size 160 --num_epoch 1000 --lr 1e-4 --no_lr_decay \
#     --use_grad_checkpointing --use_ema --save_content

############################### ADM ~ CelebA 256 ###################################
# python -m lfm_tpu.cli.main train --preset celeb256_adm \
#     --datadir data/celeba/celeba-lmdb --vae_ckpt sd-vae-ft-mse.bin \
#     --batch_size 112 --num_epoch 500 --lr 2e-5 --use_ema --save_content

############################### ADM ~ CelebA 512 (bf16) ############################
# python -m lfm_tpu.cli.main train --preset celeb512_adm \
#     --datadir data/celeba_512 --vae_ckpt sd-vae-ft-mse.bin \
#     --batch_size 24 --num_epoch 500 --lr 2e-5 --precision bf16 --use_ema
