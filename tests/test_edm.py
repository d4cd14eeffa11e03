"""EDM family tests: shapes + ground-truth parity vs the reference torch
SongUNet/DhariwalUNet (imported read-only, timm stubbed)."""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfm_tpu.core.config import ModelConfig
from lfm_tpu.nn.convert_edm import convert_edm_state_dict
from lfm_tpu.nn.edm_unet import DhariwalUNet, SongUNet, create_edm_network

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)


def _stub_timm():
    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    models_mod = types.ModuleType("timm.models")
    vt = types.ModuleType("timm.models.vision_transformer")
    vt.Attention = vt.Mlp = vt.PatchEmbed = object
    timm.models = models_mod
    models_mod.vision_transformer = vt
    sys.modules.update({
        "timm": timm, "timm.models": models_mod,
        "timm.models.vision_transformer": vt,
    })


def test_dhariwal_shapes():
    m = DhariwalUNet(img_resolution=16, model_channels=32, channel_mult=(1, 2),
                     num_blocks=1, attn_resolutions=(8,), dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    t = jnp.array([0.3, 0.7])
    p = m.init(jax.random.PRNGKey(1), t, x)
    out = m.apply(p, t, x)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)  # zero-init out_conv


@pytest.mark.parametrize("etype,enc,filt,noise_mult", [
    ("positional", "standard", (1.0, 1.0), 1),      # ddpm++
    ("fourier", "residual", (1.0, 3.0, 3.0, 1.0), 2),  # ncsn++
])
def test_song_shapes(etype, enc, filt, noise_mult):
    m = SongUNet(img_resolution=16, model_channels=32, channel_mult=(1, 2),
                 num_blocks=1, attn_resolutions=(8,), dropout=0.0,
                 embedding_type=etype, encoder_type=enc, resample_filter=filt,
                 channel_mult_noise=noise_mult)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    t = jnp.array([0.3, 0.7])
    rngs = {"params": jax.random.PRNGKey(1)}
    p = m.init(rngs, t, x)
    out = m.apply(p, t, x)
    assert out.shape == x.shape


def _load_ref_edm():
    import torch  # noqa

    _stub_timm()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import models.EDM as ref_edm

    return ref_edm


def _randomize_zero_params(ref):
    import torch

    with torch.no_grad():
        for p in ref.parameters():
            if p.abs().sum() == 0:
                p.copy_(torch.randn_like(p) * 0.05)


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
@pytest.mark.parametrize("label_dim", [0, 7])
def test_dhariwal_parity_vs_reference(label_dim):
    import torch

    ref_edm = _load_ref_edm()
    torch.manual_seed(0)
    ref = ref_edm.DhariwalUNet(
        img_resolution=16, in_channels=4, out_channels=4, label_dim=label_dim,
        model_channels=32, channel_mult=[1, 2], num_blocks=1,
        attn_resolutions=[8], dropout=0.0,
    )
    ref.eval()
    _randomize_zero_params(ref)

    mine = DhariwalUNet(img_resolution=16, in_channels=4, out_channels=4,
                        label_dim=label_dim, model_channels=32,
                        channel_mult=(1, 2), num_blocks=1,
                        attn_resolutions=(8,), dropout=0.0)
    params = convert_edm_state_dict(ref.state_dict())

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
    t = np.array([0.3, 0.7], np.float32)
    y = np.array([2, 5]) if label_dim else None

    with torch.no_grad():
        want = ref(torch.from_numpy(t), torch.from_numpy(x),
                   torch.from_numpy(y) if y is not None else None).numpy()
    got = mine.apply(params, jnp.asarray(t), jnp.asarray(x.transpose(0, 2, 3, 1)),
                     jnp.asarray(y) if y is not None else None)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
@pytest.mark.parametrize("variant", ["ddpm++", "ncsn++"])
def test_song_parity_vs_reference(variant):
    import torch

    ref_edm = _load_ref_edm()
    torch.manual_seed(0)
    kw = dict(
        img_resolution=16, in_channels=4, out_channels=4, label_dim=0,
        model_channels=32, channel_mult=[1, 2], num_blocks=1,
        attn_resolutions=[8], dropout=0.0,
    )
    if variant == "ncsn++":
        extra = dict(embedding_type="fourier", channel_mult_noise=2,
                     encoder_type="residual", resample_filter=[1, 3, 3, 1])
    else:
        extra = dict(embedding_type="positional", channel_mult_noise=1,
                     encoder_type="standard", resample_filter=[1, 1])
    ref = ref_edm.SongUNet(**kw, **extra, decoder_type="standard")
    ref.eval()
    _randomize_zero_params(ref)

    mine = SongUNet(
        img_resolution=16, in_channels=4, out_channels=4, model_channels=32,
        channel_mult=(1, 2), num_blocks=1, attn_resolutions=(8,), dropout=0.0,
        embedding_type=extra["embedding_type"],
        channel_mult_noise=extra["channel_mult_noise"],
        encoder_type=extra["encoder_type"],
        resample_filter=tuple(float(v) for v in extra["resample_filter"]),
    )
    params = convert_edm_state_dict(ref.state_dict())

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
    t = np.array([0.4, 0.9], np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(t), torch.from_numpy(x)).numpy()
    got = mine.apply(params, jnp.asarray(t), jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_dhariwal_cfg_parity():
    import torch

    ref_edm = _load_ref_edm()
    torch.manual_seed(0)
    ref = ref_edm.DhariwalUNet(
        img_resolution=16, in_channels=4, out_channels=4, label_dim=5,
        model_channels=32, channel_mult=(1, 2), num_blocks=1,
        attn_resolutions=(8,), dropout=0.0,
    )
    ref.eval()
    _randomize_zero_params(ref)

    mine = DhariwalUNet(img_resolution=16, in_channels=4, out_channels=4,
                        label_dim=5, model_channels=32, channel_mult=(1, 2),
                        num_blocks=1, attn_resolutions=(8,), dropout=0.0)
    params = convert_edm_state_dict(ref.state_dict())

    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 4, 16, 16)).astype(np.float32)
    x[2:] = x[:2]
    t = np.full((4,), 0.5, np.float32)
    y = np.array([1, 2, 1, 2])

    with torch.no_grad():
        want = ref.forward_with_cfg(torch.from_numpy(t), torch.from_numpy(x),
                                    torch.from_numpy(y), cfg_scale=1.5).numpy()
    got = mine.forward_with_cfg(params, jnp.asarray(t),
                                jnp.asarray(x.transpose(0, 2, 3, 1)),
                                jnp.asarray(y), cfg_scale=1.5)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


def test_factory_dispatch():
    cfg = ModelConfig(model_type="adm", image_size=128, nf=32, ch_mult=(1, 2),
                      num_res_blocks=1, attn_resolutions=(8,))
    m = create_edm_network(cfg)
    assert isinstance(m, DhariwalUNet)
    cfg2 = ModelConfig(model_type="ncsn++", image_size=128, nf=32, ch_mult=(1, 2),
                       num_res_blocks=1, attn_resolutions=(8,))
    assert isinstance(create_edm_network(cfg2), SongUNet)


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_generic_sampler_cfg_matches_reference_for_edm():
    """build_velocity's CFG for EDM models must equal the reference's
    drop-half-label semantics (zeroed one-hot, EDM.py:825-826, 847-861)."""
    import torch

    ref_edm = _load_ref_edm()
    torch.manual_seed(0)
    ref = ref_edm.DhariwalUNet(
        img_resolution=16, in_channels=4, out_channels=4, label_dim=5,
        model_channels=32, channel_mult=(1, 2), num_blocks=1,
        attn_resolutions=(8,), dropout=0.0,
    )
    ref.eval()
    _randomize_zero_params(ref)

    mine = DhariwalUNet(img_resolution=16, in_channels=4, out_channels=4,
                        label_dim=5, model_channels=32, channel_mult=(1, 2),
                        num_blocks=1, attn_resolutions=(8,), dropout=0.0)
    params = convert_edm_state_dict(ref.state_dict())

    from lfm_tpu.sample.sample import build_velocity

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
    y = np.array([1, 3])
    t = np.full((4,), 0.5, np.float32)

    x2 = np.concatenate([x, x])
    with torch.no_grad():
        want = ref.forward_with_cfg(torch.from_numpy(t), torch.from_numpy(x2),
                                    torch.from_numpy(np.concatenate([y, y])),
                                    cfg_scale=1.5).numpy()[:2]

    v = build_velocity(mine, params, jnp.asarray(y), cfg_scale=1.5, num_classes=5)
    got = np.asarray(v(0.5, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=5e-4, atol=5e-5)


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
@pytest.mark.parametrize("enc,dec", [("skip", "standard"), ("standard", "skip"),
                                     ("skip", "skip")])
def test_song_skip_variants_parity(enc, dec):
    """Progressive skip encoder/decoder paths (EDM.py:606-610,649-661)."""
    import torch

    ref_edm = _load_ref_edm()
    torch.manual_seed(0)
    kw = dict(img_resolution=16, in_channels=4, out_channels=4, label_dim=0,
              model_channels=32, channel_mult=[1, 2], num_blocks=1,
              attn_resolutions=[8], dropout=0.0,
              embedding_type="positional", channel_mult_noise=1,
              resample_filter=[1, 1])
    ref = ref_edm.SongUNet(**kw, encoder_type=enc, decoder_type=dec)
    ref.eval()
    _randomize_zero_params(ref)

    mine = SongUNet(
        img_resolution=16, in_channels=4, out_channels=4, model_channels=32,
        channel_mult=(1, 2), num_blocks=1, attn_resolutions=(8,), dropout=0.0,
        embedding_type="positional", channel_mult_noise=1,
        encoder_type=enc, decoder_type=dec, resample_filter=(1.0, 1.0),
    )
    params = convert_edm_state_dict(ref.state_dict())

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
    t = np.array([0.3, 0.6], np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(t), torch.from_numpy(x)).numpy()
    got = mine.apply(params, jnp.asarray(t), jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=5e-4, atol=5e-5)
