"""Downstream train-loop integration tests (tiny, 2 steps)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lfm_tpu.core.config import Config, ModelConfig, TrainConfig
from lfm_tpu.nn.encoders import SpatialRescaler
from lfm_tpu.train.downstream_loops import train_inpainting, train_semantic
from lfm_tpu.vae.autoencoder_kl import AutoencoderKL

RES = 32


def _vae():
    vae = AutoencoderKL(block_out=(32, 32, 32, 32))
    return vae, vae.init(jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 3)),
                         jax.random.PRNGKey(1))


class _TinyInpaint:
    def __len__(self):
        return 8

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        img = rng.uniform(-1, 1, (RES, RES, 3)).astype(np.float32)
        mask = np.zeros((RES, RES, 1), np.float32)
        mask[8:24, 8:24] = 1
        return img, mask, img * (1 - mask)


class _TinySeg:
    def __len__(self):
        return 8

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        img = rng.uniform(-1, 1, (RES, RES, 3)).astype(np.float32)
        seg = rng.integers(0, 5, (RES, RES)).astype(np.int32)
        return img, seg


def _config(tmp_path, in_ch):
    return Config(
        exp="smoke", dataset="celeba_256", output_dir=str(tmp_path / "out"),
        model=ModelConfig(model_type="adm", use_origin_adm=True, image_size=RES,
                          num_in_channels=in_ch, nf=32, ch_mult=(1, 2),
                          num_res_blocks=1, attn_resolutions=(2,), num_heads=2),
        train=TrainConfig(batch_size=8, num_epoch=0, lr=1e-3, no_lr_decay=True,
                          use_ema=True, save_content=True, save_content_every=1,
                          save_ckpt_every=1, plot_every=1, precision="f32"),
    )


def test_train_inpainting_loop(tmp_path, mesh8):
    vae, vae_params = _vae()
    config = _config(tmp_path, 9)
    state = train_inpainting(config, _TinyInpaint(), vae, vae_params,
                             mesh=mesh8, log_fn=lambda *a: None)
    assert int(state.step) == 1
    exp = os.path.join(str(tmp_path / "out") + "_inpaint", "celeba_256", "smoke")
    assert os.path.isdir(os.path.join(exp, "content"))
    assert os.path.exists(os.path.join(exp, "image_epoch_masked_0.png"))
    assert os.path.exists(os.path.join(exp, "image_epoch_0.png"))


def test_train_semantic_loop(tmp_path, mesh8):
    vae, vae_params = _vae()
    config = _config(tmp_path, 8)
    rescaler = SpatialRescaler(n_stages=3, multiplier=0.5, out_channels=4)
    state = train_semantic(config, _TinySeg(), vae, vae_params, rescaler,
                           num_classes=5, mesh=mesh8, log_fn=lambda *a: None)
    assert int(state.step) == 1
    # rescaler weights present in checkpointed params
    assert "channel_mapper" in jax.tree_util.tree_map(lambda x: 0, state.params["cond"])
    exp = os.path.join(str(tmp_path / "out") + "_mask2image", "celeba_256", "smoke")
    assert os.path.exists(os.path.join(exp, "image_epoch_0_gt.png"))
