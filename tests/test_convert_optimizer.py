"""content.pth full-resume conversion test.

Trains the actual reference torch ADM UNet for 3 AdamW(+EMA) steps on a loss
with framework-independent gradients (0.5*sum(p^2) => grad = p), saves a
content.pth-style dict, converts it, then takes ONE more step on BOTH sides
— torch and the converted optax state — and checks the parameters agree.
That only holds if params, Adam moments, step count and EMA all converted
correctly."""

import os
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)

TINY = dict(
    image_size=16, in_channels=4, model_channels=32, out_channels=4,
    num_res_blocks=1, attention_resolutions=(8,), channel_mult=(1, 2),
    num_heads=2,
)
LR = 1e-3


def _stub_timm():
    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    models_mod = types.ModuleType("timm.models")
    vt = types.ModuleType("timm.models.vision_transformer")
    vt.Attention = vt.Mlp = vt.PatchEmbed = object
    timm.models = models_mod
    models_mod.vision_transformer = vt
    sys.modules.update({"timm": timm, "timm.models": models_mod,
                        "timm.models.vision_transformer": vt})


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_content_pth_resume_continues_identically():
    import torch

    _stub_timm()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.guided_diffusion.unet import UNetModel as TorchUNet
    from EMA import EMA as TorchEMA

    torch.manual_seed(0)
    ref = TorchUNet(
        image_size=TINY["image_size"], in_channels=TINY["in_channels"],
        model_channels=TINY["model_channels"], out_channels=TINY["out_channels"],
        num_res_blocks=TINY["num_res_blocks"],
        attention_resolutions=TINY["attention_resolutions"],
        channel_mult=TINY["channel_mult"], num_heads=TINY["num_heads"],
        use_scale_shift_norm=True,
    )
    with torch.no_grad():
        for p in ref.parameters():
            if p.abs().sum() == 0:
                p.copy_(torch.randn_like(p) * 0.05)

    opt = torch.optim.AdamW(ref.parameters(), lr=LR, weight_decay=0.0)
    opt = TorchEMA(opt, ema_decay=0.9)

    def torch_step():
        opt.optimizer.zero_grad()
        loss = sum(0.5 * (p ** 2).sum() for p in ref.parameters())
        loss.backward()
        opt.step()

    for _ in range(3):
        torch_step()

    content = {
        "epoch": 2,
        "global_step": 3,
        "model_dict": {k: v.clone() for k, v in ref.state_dict().items()},
        # modern torch breaks the vendored EMA wrapper's state_dict();
        # the inner optimizer shares the state dict (incl. the 'ema' entries)
        "optimizer": opt.optimizer.state_dict(),
    }

    # ---- convert ----
    from lfm_tpu.core.config import Config, ModelConfig, TrainConfig
    from lfm_tpu.core.convert_optimizer import convert_reference_content
    from lfm_tpu.nn.adm_unet import UNetModel

    config = Config(model=ModelConfig(
        model_type="adm", use_origin_adm=True, image_size=16 * 8,
        num_in_channels=4, num_out_channels=4, nf=32, ch_mult=(1, 2),
        num_res_blocks=1, attn_resolutions=(8,), num_heads=2,
    ))
    mine = UNetModel(**TINY, use_scale_shift_norm=True)
    tx = optax.adamw(LR, b1=0.9, b2=0.999, weight_decay=0.0)
    state, epoch, gstep = convert_reference_content(content, config, mine, tx)
    assert epoch == 2 and gstep == 3

    # converted params match torch exactly
    from lfm_tpu.nn.convert_adm import convert_adm_state_dict

    want_params = convert_adm_state_dict(content["model_dict"], mine)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(want_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # ---- one more step on both sides ----
    torch_step()
    want_after = convert_adm_state_dict(ref.state_dict(), mine)

    grads = state.params  # grad of 0.5*sum(p^2) is p
    updates, _ = tx.update(
        jax.tree_util.tree_map(jnp.asarray, grads), state.opt_state,
        jax.tree_util.tree_map(jnp.asarray, state.params),
    )
    got_after = jax.tree_util.tree_map(
        lambda p, u: jnp.asarray(p) + u, state.params, updates
    )

    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(got_after),
        jax.tree_util.tree_leaves_with_path(want_after),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6,
            err_msg=jax.tree_util.keystr(pa),
        )

    # EMA converted: ema = decay*ema + (1-decay)*p tracked over torch steps
    ema_leaves = jax.tree_util.tree_leaves(state.ema_params)
    p_leaves = jax.tree_util.tree_leaves(state.params)
    diffs = [float(np.max(np.abs(np.asarray(e) - np.asarray(p))))
             for e, p in zip(ema_leaves, p_leaves)]
    assert max(diffs) > 0  # EMA state is distinct from the live params


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_content_pth_resume_dit():
    """Same continued-training equivalence for DiT — exercises the frozen
    pos_embed Parameter, which occupies an optimizer param INDEX but never
    gets Adam state (requires_grad=False)."""
    import torch
    import torch.nn as tnn

    # functional timm shim (as in test_convert.py)
    class _PatchEmbed(tnn.Module):
        def __init__(self, img_size, patch_size, in_chans, embed_dim, bias=True):
            super().__init__()
            self.patch_size = (patch_size, patch_size)
            self.num_patches = (img_size // patch_size) ** 2
            self.proj = tnn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                   stride=patch_size, bias=bias)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    class _Attention(tnn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False, **kw):
            super().__init__()
            self.num_heads = num_heads
            self.scale = (dim // num_heads) ** -0.5
            self.qkv = tnn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = tnn.Linear(dim, dim)

        def forward(self, x):
            b, n, c = x.shape
            qkv = self.qkv(x).reshape(b, n, 3, self.num_heads, c // self.num_heads)
            q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
            attn = ((q @ k.transpose(-2, -1)) * self.scale).softmax(dim=-1)
            return self.proj((attn @ v).transpose(1, 2).reshape(b, n, c))

    class _Mlp(tnn.Module):
        def __init__(self, in_features, hidden_features, act_layer, drop=0.0):
            super().__init__()
            self.fc1 = tnn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = tnn.Linear(hidden_features, in_features)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    timm = types.ModuleType("timm")
    mm = types.ModuleType("timm.models")
    vt = types.ModuleType("timm.models.vision_transformer")
    vt.PatchEmbed, vt.Attention, vt.Mlp = _PatchEmbed, _Attention, _Mlp
    timm.models = mm
    mm.vision_transformer = vt
    sys.modules.update({"timm": timm, "timm.models": mm,
                        "timm.models.vision_transformer": vt})
    for mod in list(sys.modules):
        if mod == "models" or mod.startswith("models."):
            del sys.modules[mod]
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.DiT import DiT_models

    torch.manual_seed(0)
    ref = DiT_models["DiT-S/2"](img_resolution=8, in_channels=4,
                                label_dropout=0.0, num_classes=1)
    with torch.no_grad():
        for p in ref.parameters():
            if p.requires_grad and p.abs().sum() == 0:
                p.copy_(torch.randn_like(p) * 0.05)

    opt = torch.optim.AdamW(ref.parameters(), lr=LR, weight_decay=0.0)

    def torch_step():
        opt.zero_grad()
        loss = sum(0.5 * (p ** 2).sum() for p in ref.parameters()
                   if p.requires_grad)
        loss.backward()
        opt.step()

    for _ in range(3):
        torch_step()

    content = {"epoch": 1, "global_step": 3,
               "model_dict": {k: v.clone() for k, v in ref.state_dict().items()},
               "optimizer": opt.state_dict()}

    from lfm_tpu.core.config import Config, ModelConfig
    from lfm_tpu.core.convert_optimizer import convert_reference_content
    from lfm_tpu.nn.convert_dit import convert_dit_state_dict
    from lfm_tpu.nn.dit import create_dit

    config = Config(model=ModelConfig(model_type="DiT-S/2", image_size=64,
                                      num_classes=1))
    mine = create_dit("DiT-S/2", img_resolution=8, num_classes=1)
    tx = optax.adamw(LR, b1=0.9, b2=0.999, weight_decay=0.0)
    state, epoch, gstep = convert_reference_content(content, config, mine, tx)

    torch_step()
    want_after = convert_dit_state_dict(ref.state_dict(), depth=12)

    grads = state.params
    updates, _ = tx.update(jax.tree_util.tree_map(jnp.asarray, grads),
                           state.opt_state,
                           jax.tree_util.tree_map(jnp.asarray, state.params))
    got_after = jax.tree_util.tree_map(lambda p, u: jnp.asarray(p) + u,
                                       state.params, updates)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(got_after),
        jax.tree_util.tree_leaves_with_path(want_after),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=2e-6, err_msg=jax.tree_util.keystr(pa))


def test_inject_restores_schedule_count():
    """Resuming a content.pth with cosine LR decay must continue the
    schedule from the checkpointed global step, not restart at the epoch-0
    LR (reference restores scheduler.state_dict(),
    train_flow_latent.py:121-124; ADVICE round-1 #1)."""
    from lfm_tpu.core.config import TrainConfig
    from lfm_tpu.core.convert_optimizer import _inject_adam_state
    from lfm_tpu.train.state import cosine_epoch_schedule, make_optimizer

    cfg = TrainConfig(lr=1e-3, no_lr_decay=False, num_epoch=100)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    params = {"w": jnp.ones((3,))}
    mu = {"w": jnp.full((3,), 0.1)}
    nu = {"w": jnp.full((3,), 0.2)}

    st = _inject_adam_state(tx.init(params), mu, nu, count=500,
                            schedule_count=500)

    found_adam = found_sched = False

    def walk(node):
        nonlocal found_adam, found_sched
        if isinstance(node, optax.ScaleByAdamState):
            found_adam = True
            assert int(node.count) == 500
            np.testing.assert_allclose(np.asarray(node.mu["w"]), 0.1)
        elif hasattr(node, "_fields") and set(node._fields) == {"count"}:
            found_sched = True
            assert int(node.count) == 500
        elif isinstance(node, tuple):
            for x in node:
                walk(x)

    walk(st)
    assert found_adam and found_sched

    # one optimizer update from the injected state must apply the lr at
    # step 500 (epoch 50), not the epoch-0 lr: compare against a state
    # whose schedule count was (wrongly) left at 0
    sched = cosine_epoch_schedule(cfg, steps_per_epoch=10)
    lr500, lr0 = float(sched(500)), float(sched(0))
    assert abs(lr500 - lr0) > 1e-5  # schedule actually decays by then

    grads = {"w": jnp.ones((3,))}
    upd_resumed, _ = tx.update(grads, st, params)
    st0 = _inject_adam_state(tx.init(params), mu, nu, count=500,
                             schedule_count=0)
    upd_fresh, _ = tx.update(grads, st0, params)
    ratio = float(upd_resumed["w"][0]) / float(upd_fresh["w"][0])
    np.testing.assert_allclose(ratio, lr500 / lr0, rtol=1e-5)
