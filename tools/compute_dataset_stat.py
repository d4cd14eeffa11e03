"""Compute FID reference statistics for a dataset
(reference pytorch_fid/compute_dataset_stat.py:13-66, without the JPEG dump
round-trip: activations stream straight from the data pipeline).

Usage:
  python tools/compute_dataset_stat.py --dataset celeba_256 --datadir ... \\
      --inception_ckpt pt_inception-2015-12-05-6726825d.pth \\
      --out pytorch_fid/celebahq_stat.npy [--max_samples 50000]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--datadir", required=True)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--inception_ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--max_samples", type=int, default=0)
    args = p.parse_args()

    from lfm_tpu.core.config import Config, DataConfig, ModelConfig
    from lfm_tpu.data import DataLoader, get_dataset
    from lfm_tpu.eval.fid import ActivationExtractor, activation_statistics, save_statistics
    from lfm_tpu.eval.inception import load_inception_params

    config = Config(
        dataset=args.dataset,
        model=ModelConfig(model_type="DiT-L/2", image_size=args.image_size),
        data=DataConfig(dataset=args.dataset, datadir=args.datadir),
    )
    ds = get_dataset(config)
    loader = DataLoader(ds, args.batch_size, shuffle=False, drop_last=False)
    extractor = ActivationExtractor(load_inception_params(args.inception_ckpt))

    acts, seen = [], 0
    for batch in loader:
        x01 = (batch["x"] + 1.0) / 2.0  # dataset yields [-1,1]
        acts.append(extractor(np.clip(x01, 0, 1)))
        seen += len(x01)
        if args.max_samples and seen >= args.max_samples:
            break
    acts = np.concatenate(acts, axis=0)
    if args.max_samples:
        acts = acts[: args.max_samples]
    mu, sigma = activation_statistics(acts)
    save_statistics(args.out, mu, sigma)
    print(f"saved {args.out}: mu {mu.shape}, sigma {sigma.shape} from {len(acts)} samples")


if __name__ == "__main__":
    main()
