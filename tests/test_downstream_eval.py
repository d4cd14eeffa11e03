"""Downstream eval harness tests (tiny shapes)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from lfm_tpu.core.config import Config, ModelConfig, SampleConfig
from lfm_tpu.nn.adm_unet import UNetModel
from lfm_tpu.nn.encoders import SpatialRescaler
from lfm_tpu.sample.downstream import (
    InpaintingEvalDataset,
    make_semantic_sampler,
    run_inpainting_eval,
    to_rgb,
)
from lfm_tpu.vae.autoencoder_kl import AutoencoderKL

RES = 32


def _vae():
    vae = AutoencoderKL(block_out=(32, 32, 32, 32))
    return vae, vae.init(jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 3)),
                         jax.random.PRNGKey(1))


def _unet(in_ch):
    m = UNetModel(image_size=4, in_channels=in_ch, model_channels=32,
                  out_channels=4, num_res_blocks=1, attention_resolutions=(2,),
                  channel_mult=(1, 2), num_heads=2)
    return m, m.init(jax.random.PRNGKey(2), jnp.zeros((1,)), jnp.zeros((1, 4, 4, in_ch)))


def test_inpainting_eval_dataset_and_run(tmp_path):
    rng = np.random.default_rng(0)
    indir = tmp_path / "imgs"
    maskdir = tmp_path / "masks"
    indir.mkdir()
    maskdir.mkdir()
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (RES, RES, 3), np.uint8)).save(
            indir / f"{i:06d}.jpg")
        m = np.full((RES, RES), 255, np.uint8)
        m[8:24, 8:24] = 0  # 0 in file -> hole after inversion
        Image.fromarray(m).save(maskdir / f"{i:06d}.png")

    ds = InpaintingEvalDataset(str(indir), str(maskdir), n=4)
    img, mask, masked = ds[0]
    assert mask[16, 16, 0] == 1.0 and mask[0, 0, 0] == 0.0
    np.testing.assert_allclose(masked, ((img + 1) / 2 * (1 - mask)) * 2 - 1, atol=1e-6)

    vae, vae_params = _vae()
    model, params = _unet(9)
    config = Config(model=ModelConfig(model_type="adm", use_origin_adm=True,
                                      image_size=RES),
                    sample=SampleConfig(method="euler", num_steps=2))
    out_dir = str(tmp_path / "gen")
    run_inpainting_eval(config, model, params, vae, vae_params, ds, out_dir,
                        batch_size=2, log_fn=lambda *a: None)
    files = sorted(os.listdir(out_dir))
    assert len(files) == 4
    # composite preserves real pixels outside the hole
    out0 = np.asarray(Image.open(os.path.join(out_dir, "0.jpg")), np.float32) / 255.0
    real0 = (img + 1) / 2
    outside = 1 - mask[..., 0:1]
    err = np.abs(out0 - real0) * outside
    assert err.sum() / (outside.sum() * 3) < 0.08  # mean abs error, jpeg tolerance


def test_semantic_sampler_and_to_rgb():
    vae, vae_params = _vae()
    model, params = _unet(8)
    rescaler = SpatialRescaler(n_stages=3, multiplier=0.5, out_channels=4)
    rparams = rescaler.init(jax.random.PRNGKey(3), jnp.zeros((1, RES, RES, 19)))["params"]
    config = Config(model=ModelConfig(model_type="adm", image_size=RES),
                    sample=SampleConfig(method="euler", num_steps=2))
    sampler = make_semantic_sampler(config, model, params, rescaler, rparams,
                                    vae, vae_params, num_classes=19)
    seg = np.zeros((2, RES, RES), np.int32)
    seg[:, 8:, :] = 5
    out = sampler(seg, jax.random.PRNGKey(0))
    assert out.shape == (2, RES, RES, 3)
    assert np.isfinite(np.asarray(out)).all()

    rgb = to_rgb(jax.nn.one_hot(jnp.asarray(seg), 19))
    assert rgb.shape == (2, RES, RES, 3)
    assert float(rgb.min()) >= -1.0 - 1e-5 and float(rgb.max()) <= 1.0 + 1e-5
