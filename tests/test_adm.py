"""ADM UNet tests: shapes/flags + ground-truth activation parity against the
reference torch implementation (imported read-only from /root/reference,
skipped when unavailable)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfm_tpu.core.config import ModelConfig
from lfm_tpu.nn.adm_unet import UNetModel, build_unet_plan, create_adm_unet
from lfm_tpu.nn.convert_adm import convert_adm_state_dict

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)

TINY = dict(
    image_size=16, in_channels=4, model_channels=32, out_channels=4,
    num_res_blocks=1, attention_resolutions=(8, 4), channel_mult=(1, 2),
    num_heads=2,
)


def _init(model, n=2, res=16):
    x = jax.random.normal(jax.random.PRNGKey(1), (n, res, res, model.in_channels))
    t = jnp.linspace(0.2, 0.8, n)
    y = jnp.arange(n) % model.num_classes if model.num_classes else None
    params = model.init(jax.random.PRNGKey(0), t, x, y)
    return params, t, x, y


@pytest.mark.parametrize("flags", [
    {},
    {"use_scale_shift_norm": False},
    {"resblock_updown": True},
    {"use_new_attention_order": True},
    {"num_head_channels": 16},
    {"num_classes": 10},
    {"conv_resample": False},
])
def test_forward_shapes_all_flags(flags):
    model = UNetModel(**{**TINY, **flags})
    params, t, x, y = _init(model)
    out = model.apply(params, t, x, y)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_zero_init_output_conv():
    model = UNetModel(**TINY)
    params, t, x, _ = _init(model)
    out = model.apply(params, t, x)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_plan_matches_reference_topology():
    """Sanity-check the plan for the celeb256_adm config: ch_mult (1,2,2,2),
    2 res blocks, attn at ds 16,8 with latent 32 -> attn only when ds in
    {16, 8}? ds counts downsample *rate* 1,2,4,8 -> attn at rates 16/8 never
    hit for 4 levels: ds max = 8."""
    plan = build_unet_plan(256, (1, 2, 2, 2), 2, (16, 8), 4, False)
    # 1 conv_in + 4 levels * 2 res + 3 downsample = 12 input blocks
    assert len(plan.input_blocks) == 12
    kinds = [tuple(s.kind for s in b) for b in plan.input_blocks]
    assert kinds[0] == ("conv_in",)
    # attention appears at ds=8 (level 3) in the encoder
    assert ("res", "attn") in kinds
    assert len(plan.output_blocks) == 12
    assert plan.out_ch_final == 256


def test_scalar_t_broadcast():
    model = UNetModel(**TINY)
    params, t, x, _ = _init(model)
    out_scalar = model.apply(params, jnp.float32(0.5), x)
    out_vec = model.apply(params, jnp.full((2,), 0.5), x)
    np.testing.assert_allclose(np.asarray(out_scalar), np.asarray(out_vec), atol=1e-6)


# ---------------------------------------------------------------------------
# Ground-truth parity vs the reference torch model
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
@pytest.mark.parametrize("flags", [
    {},
    {"use_scale_shift_norm": False},
    {"use_new_attention_order": True},
    {"resblock_updown": True},
    {"num_classes": 7},
    {"num_head_channels": 16},
])
def test_parity_vs_reference_torch(flags):
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)
    # models/__init__.py imports DiT -> timm (absent here); stub what DiT needs
    # so the guided_diffusion submodule can be imported. We never run the stubs.
    if "timm" not in sys.modules:
        import types

        timm = types.ModuleType("timm")
        models_mod = types.ModuleType("timm.models")
        vt = types.ModuleType("timm.models.vision_transformer")
        vt.Attention = vt.Mlp = vt.PatchEmbed = object
        timm.models = models_mod
        models_mod.vision_transformer = vt
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models_mod
        sys.modules["timm.models.vision_transformer"] = vt
    from models.guided_diffusion.unet import UNetModel as TorchUNet

    torch.manual_seed(0)
    kw = {**TINY, **flags}
    ref = TorchUNet(
        image_size=kw["image_size"], in_channels=kw["in_channels"],
        model_channels=kw["model_channels"], out_channels=kw["out_channels"],
        num_res_blocks=kw["num_res_blocks"],
        attention_resolutions=kw["attention_resolutions"],
        channel_mult=kw["channel_mult"], num_heads=kw["num_heads"],
        num_head_channels=kw.get("num_head_channels", -1),
        use_scale_shift_norm=kw.get("use_scale_shift_norm", True),
        resblock_updown=kw.get("resblock_updown", False),
        use_new_attention_order=kw.get("use_new_attention_order", False),
        num_classes=kw.get("num_classes", None),
        conv_resample=kw.get("conv_resample", True),
    )
    ref.eval()
    # randomize the zero-initialised layers so parity is non-trivial
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if p.abs().sum() == 0:
                p.copy_(torch.randn_like(p) * 0.05)

    mine = UNetModel(**kw)
    params = convert_adm_state_dict(ref.state_dict(), mine)

    n = 2
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, kw["in_channels"], 16, 16)).astype(np.float32)
    t = np.array([0.3, 0.7], np.float32)
    y = np.array([1, 3]) if "num_classes" in flags else None

    with torch.no_grad():
        want = ref(
            torch.from_numpy(t), torch.from_numpy(x),
            torch.from_numpy(y) if y is not None else None,
        ).numpy()

    got = mine.apply(
        params, jnp.asarray(t), jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(y) if y is not None else None,
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


def test_cfg_null_label_is_class_zero():
    """Origin-ADM embeds labels by integer GATHER (unet.py:630), so a -1
    null would silently wrap to the LAST class row. The reference harness
    uses zeros_like(y) (test_flow_latent.py:180); build_velocity must do
    the same (ADVICE round-1 #3)."""
    from lfm_tpu.sample.sample import build_velocity

    model = UNetModel(**{**TINY, "num_classes": 5})
    params, t, x, y = _init(model)
    # the output conv is zero-initialized -> forward would be identically 0;
    # randomize every zero leaf so labels actually influence the output
    keys = iter(jax.random.split(jax.random.PRNGKey(7), 256))
    params = jax.tree_util.tree_map(
        lambda p: jax.random.normal(next(keys), p.shape, p.dtype) * 0.05
        if float(jnp.abs(p).max()) == 0.0 else p, params)

    assert model.null_label == 0
    v = build_velocity(model, params, y, cfg_scale=2.0, num_classes=5)
    got = np.asarray(v(t[0], x))

    v_cond = np.asarray(model.apply(params, t[0], x, y))
    v_null = np.asarray(model.apply(params, t[0], x, jnp.zeros_like(y)))
    want = v_null + 2.0 * (v_cond - v_null)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)

    # and it must NOT equal the wrapped(-1 -> last row) combination
    v_last = np.asarray(model.apply(params, t[0], x, jnp.full_like(y, 4)))
    wrong = v_last + 2.0 * (v_cond - v_last)
    assert not np.allclose(got, wrong, rtol=1e-3, atol=1e-4)


def test_attention_block_flash_parity():
    """use_flash dispatches ADM attention to the Pallas path; off-TPU that
    is the reference einsum with single-sided 1/sqrt(d) scaling, which must
    equal the two-sided 1/sqrt(sqrt(d)) formulation (unet.py:325-330)."""
    from lfm_tpu.nn.adm_unet import ADMAttentionBlock

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 64))
    for legacy in (True, False):
        ref = ADMAttentionBlock(num_heads=4, legacy_order=legacy,
                                use_flash=False)
        fla = ADMAttentionBlock(num_heads=4, legacy_order=legacy,
                                use_flash=True)
        params = ref.init(jax.random.PRNGKey(1), x)
        a = ref.apply(params, x)
        b = fla.apply(params, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
