"""Pre-encode a dataset into VAE latents (the reference's 'latent_*' fast
path, train_flow_latent.py:132,140-141: training then skips the frozen VAE
encode each step).

Usage:
  python tools/prepare_latent_dataset.py --dataset imagenet_256 --datadir ... \\
      --vae_ckpt diffusion_pytorch_model.bin --out data/latent_imagenet_256
Writes latents.npy (N, h, w, 4) UNSCALED (scale_factor applied at train time)
and labels.npy.
"""

import argparse
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--datadir", required=True)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--vae_ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from lfm_tpu.core.config import Config, DataConfig, ModelConfig
    from lfm_tpu.data import DataLoader, get_dataset
    from lfm_tpu.vae.autoencoder_kl import AutoencoderKL
    from lfm_tpu.vae.convert import load_vae_params

    config = Config(
        dataset=args.dataset,
        model=ModelConfig(model_type="DiT-L/2", image_size=args.image_size),
        data=DataConfig(dataset=args.dataset, datadir=args.datadir),
    )
    ds = get_dataset(config)
    loader = DataLoader(ds, args.batch_size, shuffle=False, drop_last=False)
    vae = AutoencoderKL(dtype=jnp.bfloat16)
    vae_params = load_vae_params(args.vae_ckpt)

    enc = jax.jit(lambda p, x, k: vae.apply(p, x, k, method=AutoencoderKL.encode_sample))
    key = jax.random.PRNGKey(args.seed)
    zs, ys = [], []
    for i, batch in enumerate(loader):
        k = jax.random.fold_in(key, i)
        zs.append(np.asarray(enc(vae_params, jnp.asarray(batch["x"]), k), np.float16))
        ys.append(batch.get("y", np.zeros(len(batch["x"]), np.int32)))
    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "latents.npy"), np.concatenate(zs))
    np.save(os.path.join(args.out, "labels.npy"), np.concatenate(ys))
    print(f"wrote {sum(len(z) for z in zs)} latents to {args.out}")


if __name__ == "__main__":
    main()
