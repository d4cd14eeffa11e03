"""Shared tiny multi-process TRAINING fixture: fixed seeds + a deterministic
synthetic latent dataset, so independent processes (the 2-process multihost
train workers and the single-process parent) run bit-identical training with
no data or checkpoint files.

Used by tests/test_multihost.py::test_real_two_process_training and its
worker (tests/multihost_train_worker.py). Mirrors the reference's DDP
trainer spawn path (train_flow_latent.py:339-429): every process runs the
SAME program over one global mesh; gradient sync is the sharding-induced
all-reduce; host-side writes are rank-0 only.
"""

import numpy as np


class TinyLatents:
    """Deterministic per-index synthetic latents: identical in every process."""

    num_classes = 1

    def __len__(self):
        return 32

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return rng.normal(size=(8, 8, 4)).astype(np.float32), 0


def build_config(output_dir: str):
    from lfm_tpu.core.config import Config, ModelConfig, TrainConfig

    return Config(
        exp="mh_smoke",
        dataset="synthetic_latent",
        output_dir=output_dir,
        model=ModelConfig(model_type="DiT-T/2", image_size=64, num_classes=1),
        train=TrainConfig(batch_size=16, num_epoch=0, lr=1e-3,
                          no_lr_decay=True, use_ema=True, save_content=True,
                          save_content_every=1, save_ckpt_every=1,
                          plot_every=100, precision="f32"),
    )


def run_train(output_dir: str, mesh=None) -> np.ndarray:
    """Train 1 tiny epoch (2 steps) on a mesh over all visible devices;
    return the final EMA params as one flat float vector."""
    from jax.flatten_util import ravel_pytree

    from lfm_tpu.core.sharding import make_mesh
    from lfm_tpu.train.loop import train

    config = build_config(output_dir)
    mesh = mesh if mesh is not None else make_mesh()
    state = train(config, dataset=TinyLatents(), mesh=mesh,
                  log_fn=lambda *a, **k: None)
    flat, _ = ravel_pytree(state.ema_params)
    return np.asarray(flat)
