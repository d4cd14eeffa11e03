"""Model-zoo variants + loss-scaling tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from lfm_tpu.nn.variants import (
    AttentionPool2d,
    EncoderUNetModel,
    ResNet,
    SuperResModel,
    resnet18,
    resnet50,
)
from lfm_tpu.train.scaling import dynamic_loss_scale


def test_superres_model():
    m = SuperResModel(image_size=16, in_channels=8, model_channels=32,
                      out_channels=4, num_res_blocks=1,
                      attention_resolutions=(8,), channel_mult=(1, 2),
                      num_heads=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    low = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 4))
    t = jnp.array([0.5, 0.7])
    p = m.init(jax.random.PRNGKey(2), t, x, low_res=low)
    out = m.apply(p, t, x, low_res=low)
    assert out.shape == (2, 16, 16, 4)


@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial", "spatial_v2"])
def test_encoder_unet_pools(pool):
    m = EncoderUNetModel(image_size=16, in_channels=4, model_channels=32,
                         out_channels=10, num_res_blocks=1,
                         attention_resolutions=(8,), channel_mult=(1, 2),
                         num_heads=2, num_head_channels=16, pool=pool)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    t = jnp.array([0.5, 0.7])
    p = m.init(jax.random.PRNGKey(1), t, x)
    out = m.apply(p, t, x)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_resnet_variants():
    for fn, params_ratio in [(resnet18, 1), (resnet50, 2)]:
        m = fn(num_classes=10)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        variables = m.init(jax.random.PRNGKey(1), x)
        out = m.apply(variables, x)
        assert out.shape == (2, 10)
        np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)  # softmax


def test_dynamic_loss_scale():
    tx = dynamic_loss_scale(optax.sgd(0.1), init_scale=1024.0,
                            growth_interval=2)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    assert float(state.scale) == 1024.0

    # scaled finite grads -> unscaled update applied
    grads = {"w": jnp.ones(3) * 1024.0}
    updates, state = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.1, rtol=1e-6)
    assert int(state.growth_counter) == 1

    # second finite step hits growth_interval -> scale doubles
    updates, state = tx.update(grads, state, params)
    assert float(state.scale) == 2048.0
    assert int(state.growth_counter) == 0

    # overflow -> zero update + backoff
    bad = {"w": jnp.array([jnp.inf, 1.0, 1.0]) * state.scale}
    updates, state = tx.update(bad, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), 0.0)
    assert float(state.scale) == 1024.0


@pytest.mark.skipif(not __import__("os").path.isdir("/root/reference"),
                    reason="reference repo not mounted")
def test_encoder_unet_parity_vs_reference():
    """Classifier half-UNet (adaptive pool) vs the reference torch
    EncoderUNetModel (unet.py:675-879)."""
    import sys
    import types

    import torch

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        mm = types.ModuleType("timm.models")
        vt = types.ModuleType("timm.models.vision_transformer")
        vt.Attention = vt.Mlp = vt.PatchEmbed = object
        timm.models = mm
        mm.vision_transformer = vt
        sys.modules.update({"timm": timm, "timm.models": mm,
                            "timm.models.vision_transformer": vt})
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models.guided_diffusion.unet import EncoderUNetModel as TorchEnc

    torch.manual_seed(0)
    ref = TorchEnc(
        image_size=16, in_channels=4, model_channels=32, out_channels=10,
        num_res_blocks=1, attention_resolutions=(8,), channel_mult=(1, 2),
        num_heads=2, use_scale_shift_norm=True, pool="adaptive",
    )
    ref.eval()
    with torch.no_grad():
        for p in ref.parameters():
            if p.abs().sum() == 0:
                p.copy_(torch.randn_like(p) * 0.05)

    mine = EncoderUNetModel(
        image_size=16, in_channels=4, model_channels=32, out_channels=10,
        num_res_blocks=1, attention_resolutions=(8,), channel_mult=(1, 2),
        num_heads=2, use_scale_shift_norm=True, pool="adaptive",
    )

    # converter: input/middle blocks use the shared plan mapping; the
    # adaptive head's 1x1 conv (applied on the pooled 1x1 map) is a Dense
    from lfm_tpu.nn.adm_unet import build_unet_plan
    from lfm_tpu.nn.convert_adm import _conv, _gn, _layer

    sd = ref.state_dict()
    plan = build_unet_plan(32, (1, 2), 1, (8,), 4, False)
    params = {}
    for i, block in enumerate(plan.input_blocks):
        for j, spec in enumerate(block):
            params[f"input_{i}_{j}"] = _layer(sd, f"input_blocks.{i}.{j}", spec)
    for j, spec in enumerate(plan.middle_block):
        params[f"middle_{j}"] = _layer(sd, f"middle_block.{j}", spec)
    params["time_embed_1"] = {"kernel": sd["time_embed.0.weight"].numpy().T,
                              "bias": sd["time_embed.0.bias"].numpy()}
    params["time_embed_2"] = {"kernel": sd["time_embed.2.weight"].numpy().T,
                              "bias": sd["time_embed.2.bias"].numpy()}
    params["out_norm"] = _gn(sd, "out.0")
    # adaptive head: out.0 norm, out.1 silu, out.2 pool, out.3 zero conv
    w = sd["out.3.weight"].numpy()  # (10, C, 1, 1)
    params["out_proj"] = {"kernel": w[:, :, 0, 0].T, "bias": sd["out.3.bias"].numpy()}

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
    t = np.array([0.3, 0.7], np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    got = mine.apply({"params": params}, jnp.asarray(t),
                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-5)


def test_unet_upsampler_construct_and_forward():
    """UNetUpsamplerModel (reference unet_upsampler.py:1-241, dead code in
    the reference): construct + forward, triple return, GFP embeddings."""
    from lfm_tpu.nn.variants import GaussianFourierProjection, UNetUpsamplerModel

    model = UNetUpsamplerModel(
        image_size=16, in_channels=6, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(8,), channel_mult=(1, 2),
        num_heads=2,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))  # low-res
    t = jnp.array([0.3, 0.9])
    aug = jnp.array([0.5, 0.5])
    params = model.init(jax.random.PRNGKey(2), t, x, None, (cond, aug))
    out, trunk, emb = model.apply(params, t, x, None, (cond, aug))
    assert out.shape == (2, 16, 16, 3)
    assert trunk.shape == (2, 16, 16, 32)
    assert emb.shape == (2, 128)
    assert np.all(np.isfinite(np.asarray(out)))
    # zero-init output head -> identically zero output at init
    assert float(jnp.abs(out).max()) == 0.0

    # class-conditional variant
    model_c = UNetUpsamplerModel(
        image_size=16, in_channels=6, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(8,), channel_mult=(1, 2),
        num_heads=2, num_classes=5,
    )
    y = jnp.array([0, 4])
    params_c = model_c.init(jax.random.PRNGKey(3), t, x, y, (cond, aug))
    out_c, _, _ = model_c.apply(params_c, t, x, y, (cond, aug))
    assert out_c.shape == (2, 16, 16, 3)

    # GFP: frozen W, sin/cos layout
    gfp = GaussianFourierProjection(8, scale=16.0)
    p = gfp.init(jax.random.PRNGKey(4), jnp.array([1.0]))
    e = gfp.apply(p, jnp.array([1.0]))
    assert e.shape == (1, 16)
    w = np.asarray(p["params"]["W"])
    np.testing.assert_allclose(np.asarray(e[0, :8]), np.sin(2 * np.pi * w),
                               rtol=2e-5, atol=2e-5)


def test_fourier_w_excluded_from_weight_decay():
    """GaussianFourierProjection.W is stop_gradient-frozen; torch keeps it
    requires_grad=False so AdamW never touches it. Decoupled weight decay
    acts on params irrespective of grads, so both the optax chain and the
    fused update must mask W out of the decay term (ADVICE r2)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lfm_tpu.core.config import TrainConfig
    from lfm_tpu.train.state import (create_train_state, decay_mask,
                                     make_fused_adamw_ema, make_optimizer)

    params = {"params": {"time_emb": {"W": jnp.full((4,), 2.0)},
                         "dense": {"kernel": jnp.full((3, 3), 1.0)}}}
    mask = decay_mask(params)
    assert mask["params"]["time_emb"]["W"] is False
    assert mask["params"]["dense"]["kernel"] is True

    cfg = TrainConfig(lr=1e-2, weight_decay=0.1, no_lr_decay=True, use_ema=True)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)  # W grad == 0

    tx = make_optimizer(cfg, 10)
    state = create_train_state(params, cfg, 10)
    upd, new_opt = tx.update(grads, state.opt_state, params)
    new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
    np.testing.assert_allclose(
        np.asarray(new_params["params"]["time_emb"]["W"]), 2.0)
    # the decaying param DID move under zero grads (decay term active)
    assert float(jnp.abs(
        new_params["params"]["dense"]["kernel"] - 1.0).max()) > 0

    fused = make_fused_adamw_ema(cfg, 10, use_ema=True)
    p_f, _, _, _ = fused(state.opt_state, params, grads, state.ema_params)
    np.testing.assert_allclose(np.asarray(p_f["params"]["time_emb"]["W"]), 2.0)
    np.testing.assert_allclose(np.asarray(p_f["params"]["dense"]["kernel"]),
                               np.asarray(new_params["params"]["dense"]["kernel"]),
                               rtol=1e-6)
