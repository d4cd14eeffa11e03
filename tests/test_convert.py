"""Checkpoint-converter tests.

Builds synthetic state dicts with the exact reference/diffusers tensor names
and shapes, converts them, and checks (a) the tree structure matches
``model.init`` exactly, and (b) a from-first-principles numpy forward of the
DiT math (LN -> modulate -> attention -> gated residual, models/DiT.py:127-131)
agrees with the flax model under the converted weights.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lfm_tpu.nn.dit import DiT
from lfm_tpu.nn.convert_dit import convert_dit_state_dict
from lfm_tpu.vae.autoencoder_kl import AutoencoderKL
from lfm_tpu.vae.convert import convert_vae_state_dict

D, HEADS, DEPTH, RES, P, CIN = 32, 4, 2, 8, 2, 4
NCLS = 1


def _rng_sd(rng):
    """Synthetic reference DiT state dict (names per models/DiT.py)."""
    sd = {}

    def add(name, shape):
        sd[name] = rng.normal(size=shape).astype(np.float32) * 0.05

    add("x_embedder.proj.weight", (D, CIN, P, P))
    add("x_embedder.proj.bias", (D,))
    add("t_embedder.mlp.0.weight", (D, 256))
    add("t_embedder.mlp.0.bias", (D,))
    add("t_embedder.mlp.2.weight", (D, D))
    add("t_embedder.mlp.2.bias", (D,))
    add("y_embedder.embedding_table.weight", (NCLS, D))
    for i in range(DEPTH):
        add(f"blocks.{i}.adaLN_modulation.1.weight", (6 * D, D))
        add(f"blocks.{i}.adaLN_modulation.1.bias", (6 * D,))
        add(f"blocks.{i}.attn.qkv.weight", (3 * D, D))
        add(f"blocks.{i}.attn.qkv.bias", (3 * D,))
        add(f"blocks.{i}.attn.proj.weight", (D, D))
        add(f"blocks.{i}.attn.proj.bias", (D,))
        add(f"blocks.{i}.mlp.fc1.weight", (4 * D, D))
        add(f"blocks.{i}.mlp.fc1.bias", (4 * D,))
        add(f"blocks.{i}.mlp.fc2.weight", (D, 4 * D))
        add(f"blocks.{i}.mlp.fc2.bias", (D,))
    add("final_layer.adaLN_modulation.1.weight", (2 * D, D))
    add("final_layer.adaLN_modulation.1.bias", (2 * D,))
    add("final_layer.linear.weight", (P * P * CIN, D))
    add("final_layer.linear.bias", (P * P * CIN,))
    # DDP prefix + fixed pos_embed buffer, both handled by the converter
    sd = {"module." + k: v for k, v in sd.items()}
    return sd


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        out = set()
        for k, v in tree.items():
            out |= _tree_paths(v, f"{prefix}/{k}")
        return out
    return {f"{prefix}:{tuple(np.shape(tree))}"}


# ----------------------------- numpy reference -----------------------------

def _ln(x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps)


def _gelu_tanh(x):
    return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))


def _silu(x):
    return x / (1 + np.exp(-x))


def _np_dit_forward(sd, t, x_nchw, y):
    """Direct numpy transcription of the DiT equations (models/DiT.py:252-272)."""
    g = lambda n: sd["module." + n]
    N = x_nchw.shape[0]

    # patchify: conv stride P == per-patch matmul
    w, b = g("x_embedder.proj.weight"), g("x_embedder.proj.bias")
    gh = RES // P
    tok = np.zeros((N, gh * gh, D), np.float32)
    for n in range(N):
        for i in range(gh):
            for j in range(gh):
                patch = x_nchw[n, :, i * P:(i + 1) * P, j * P:(j + 1) * P]  # (C,P,P)
                tok[n, i * gh + j] = np.einsum("cpq,dcpq->d", patch, w) + b

    # fixed 2D sincos pos embed (models/DiT.py:299-346)
    def emb1d(pos, dim):
        om = 1.0 / 10_000 ** (np.arange(dim // 2, dtype=np.float64) / (dim / 2))
        out = np.outer(pos.reshape(-1), om)
        return np.concatenate([np.sin(out), np.cos(out)], 1)

    gw, gh2 = np.meshgrid(np.arange(gh, dtype=np.float32), np.arange(gh, dtype=np.float32))
    pos = np.concatenate([emb1d(gw, D // 2), emb1d(gh2, D // 2)], 1)
    tok = tok + pos[None].astype(np.float32)

    # timestep embedding, cos-first (models/DiT.py:53-62)
    half = 128
    freqs = np.exp(-np.log(10_000.0) * np.arange(half, dtype=np.float32) / half)
    args = t[:, None] * freqs[None]
    temb = np.concatenate([np.cos(args), np.sin(args)], -1)
    temb = _silu(temb @ g("t_embedder.mlp.0.weight").T + g("t_embedder.mlp.0.bias"))
    temb = temb @ g("t_embedder.mlp.2.weight").T + g("t_embedder.mlp.2.bias")
    yemb = g("y_embedder.embedding_table.weight")[y]
    c = temb + yemb

    for i in range(DEPTH):
        p = f"blocks.{i}."
        mod = _silu(c) @ g(p + "adaLN_modulation.1.weight").T + g(p + "adaLN_modulation.1.bias")
        sm, scm, gm, sp, scp, gp = np.split(mod, 6, -1)
        h = _ln(tok) * (1 + scm[:, None]) + sm[:, None]
        qkv = h @ g(p + "attn.qkv.weight").T + g(p + "attn.qkv.bias")
        q, k, v = np.split(qkv, 3, -1)
        hd = D // HEADS

        def heads(z):
            return z.reshape(N, -1, HEADS, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        att = q @ k.transpose(0, 1, 3, 2) / np.sqrt(hd)
        att = np.exp(att - att.max(-1, keepdims=True))
        att = att / att.sum(-1, keepdims=True)
        o = (att @ v).transpose(0, 2, 1, 3).reshape(N, -1, D)
        o = o @ g(p + "attn.proj.weight").T + g(p + "attn.proj.bias")
        tok = tok + gm[:, None] * o
        h = _ln(tok) * (1 + scp[:, None]) + sp[:, None]
        h = _gelu_tanh(h @ g(p + "mlp.fc1.weight").T + g(p + "mlp.fc1.bias"))
        h = h @ g(p + "mlp.fc2.weight").T + g(p + "mlp.fc2.bias")
        tok = tok + gp[:, None] * h

    mod = _silu(c) @ g("final_layer.adaLN_modulation.1.weight").T + g(
        "final_layer.adaLN_modulation.1.bias"
    )
    sh, sc = np.split(mod, 2, -1)
    h = _ln(tok) * (1 + sc[:, None]) + sh[:, None]
    h = h @ g("final_layer.linear.weight").T + g("final_layer.linear.bias")

    # unpatchify (models/DiT.py:230-243)
    h = h.reshape(N, gh, gh, P, P, CIN)
    h = np.einsum("nhwpqc->nchpwq", h).reshape(N, CIN, RES, RES)
    return h


def test_dit_converter_structure_matches_init():
    sd = _rng_sd(np.random.default_rng(0))
    model = DiT(img_resolution=RES, patch_size=P, in_channels=CIN, hidden_size=D,
                depth=DEPTH, num_heads=HEADS, num_classes=NCLS)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1,)), jnp.zeros((1, RES, RES, CIN)), None)
    conv = convert_dit_state_dict(sd, depth=DEPTH, scan_blocks=True)
    assert _tree_paths(jax.tree_util.tree_map(np.asarray, init)) == _tree_paths(conv["params"] and conv)


def test_dit_converted_forward_matches_numpy_reference():
    rng = np.random.default_rng(1)
    sd = _rng_sd(rng)
    model = DiT(img_resolution=RES, patch_size=P, in_channels=CIN, hidden_size=D,
                depth=DEPTH, num_heads=HEADS, num_classes=NCLS)
    params = convert_dit_state_dict(sd, depth=DEPTH, scan_blocks=True)

    N = 3
    x_nchw = rng.normal(size=(N, CIN, RES, RES)).astype(np.float32)
    t = np.array([0.1, 0.5, 0.9], np.float32)
    y = np.zeros(N, np.int64)

    want = _np_dit_forward(sd, t, x_nchw, y)
    got = model.apply(params, jnp.asarray(t), jnp.asarray(x_nchw.transpose(0, 2, 3, 1)),
                      jnp.asarray(y))
    got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_nchw, want, rtol=2e-4, atol=2e-5)


def test_vae_converter_structure_matches_init():
    rng = np.random.default_rng(2)
    ch = (32, 32, 32, 32)  # tiny VAE (>=32 for GroupNorm), same topology

    sd = {}

    def conv(name, o, i, k=3):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros(o, np.float32)

    def gn(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)

    def lin(name, o, i):
        sd[f"{name}.weight"] = rng.normal(size=(o, i)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros(o, np.float32)

    def resnet(pfx, cin, cout):
        gn(f"{pfx}.norm1", cin)
        conv(f"{pfx}.conv1", cout, cin)
        gn(f"{pfx}.norm2", cout)
        conv(f"{pfx}.conv2", cout, cout)
        if cin != cout:
            conv(f"{pfx}.conv_shortcut", cout, cin, k=1)

    def attn(pfx, c):
        gn(f"{pfx}.group_norm", c)
        for n in ("to_q", "to_k", "to_v"):
            lin(f"{pfx}.{n}", c, c)
        lin(f"{pfx}.to_out.0", c, c)

    conv("encoder.conv_in", ch[0], 3)
    prev = ch[0]
    for i, c in enumerate(ch):
        for j in range(2):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", prev if j == 0 else c, c)
        if i < 3:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", c, c)
        prev = c
    resnet("encoder.mid_block.resnets.0", ch[-1], ch[-1])
    resnet("encoder.mid_block.resnets.1", ch[-1], ch[-1])
    attn("encoder.mid_block.attentions.0", ch[-1])
    gn("encoder.conv_norm_out", ch[-1])
    conv("encoder.conv_out", 8, ch[-1])
    lin("quant_conv", 8, 8)
    lin("post_quant_conv", 4, 4)
    conv("decoder.conv_in", ch[-1], 4)
    resnet("decoder.mid_block.resnets.0", ch[-1], ch[-1])
    resnet("decoder.mid_block.resnets.1", ch[-1], ch[-1])
    attn("decoder.mid_block.attentions.0", ch[-1])
    rev = ch[::-1]
    prev = rev[0]
    for i, c in enumerate(rev):
        for j in range(3):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", prev if j == 0 else c, c)
        if i < 3:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", c, c)
        prev = c
    gn("decoder.conv_norm_out", rev[-1])
    conv("decoder.conv_out", 3, rev[-1])

    model = AutoencoderKL(block_out=ch)
    x = jnp.zeros((1, 32, 32, 3))
    init = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    got = convert_vae_state_dict(sd)
    assert _tree_paths(jax.tree_util.tree_map(np.asarray, init)) == _tree_paths(got)

    # converted params must run and roundtrip shapes
    z = model.apply(got, x, jax.random.PRNGKey(2), method=AutoencoderKL.encode_sample)
    assert z.shape == (1, 4, 4, 4)
    img = model.apply(got, z, method=AutoencoderKL.decode)
    assert img.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()


_REF_MISSING = not __import__("os").path.isdir("/root/reference")


def _import_reference_dit():
    """Import the reference's actual models/DiT.py with its timm dependency
    shimmed by standard torch implementations of PatchEmbed/Attention/Mlp."""
    import sys
    import types

    import torch.nn as tnn

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
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = attn.softmax(dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(b, n, c)
            return self.proj(out)

    class _Mlp(tnn.Module):
        def __init__(self, in_features, hidden_features, act_layer, drop=0.0):
            super().__init__()
            self.fc1 = tnn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = tnn.Linear(hidden_features, in_features)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    timm = types.ModuleType("timm")
    models_mod = types.ModuleType("timm.models")
    vt = types.ModuleType("timm.models.vision_transformer")
    vt.PatchEmbed, vt.Attention, vt.Mlp = _PatchEmbed, _Attention, _Mlp
    timm.models = models_mod
    models_mod.vision_transformer = vt
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models_mod
    sys.modules["timm.models.vision_transformer"] = vt
    # reference models/__init__ may be cached from other tests with plain stubs
    for mod in list(sys.modules):
        if mod == "models" or mod.startswith("models."):
            del sys.modules[mod]
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models.DiT import DiT_models

    return DiT_models


@pytest.mark.skipif(_REF_MISSING, reason="reference repo not mounted")
def test_dit_parity_vs_reference_torch_code():
    """Run the reference's actual models/DiT.py against the converted flax
    DiT (activation parity)."""
    import torch

    DiT_models = _import_reference_dit()

    torch.manual_seed(0)
    ref = DiT_models["DiT-S/2"](img_resolution=8, in_channels=4,
                                label_dropout=0.0, num_classes=1)
    ref.eval()
    with torch.no_grad():
        for p in ref.parameters():
            if p.requires_grad and p.abs().sum() == 0:
                p.copy_(torch.randn_like(p) * 0.05)

    from lfm_tpu.nn.dit import create_dit

    mine = create_dit("DiT-S/2", img_resolution=8, num_classes=1)
    params = convert_dit_state_dict(ref.state_dict(), depth=12, scan_blocks=True)

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    t = np.array([0.2, 0.8], np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(t), torch.from_numpy(x)).numpy()
    got = mine.apply(params, jnp.asarray(t), jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=5e-4, atol=5e-5)


@pytest.mark.skipif(_REF_MISSING, reason="reference repo not mounted")
def test_cfg_learn_sigma_parity_vs_reference_forward_with_cfg():
    """learn_sigma=True CFG: guidance applies only to the first in_channels;
    the sigma tail passes through unguided (reference models/DiT.py:274-290).
    Pins the NHWC guide_channels slice in ode/cfg.py (channels are the LAST
    axis here) and DiT.forward_with_cfg against the reference torch code."""
    import torch

    DiT_models = _import_reference_dit()

    torch.manual_seed(1)
    # label_dropout>0 allocates the CFG null-class row (models/DiT.py:75-79);
    # dropout itself is inert at eval / in flax's deterministic apply
    ref = DiT_models["DiT-S/2"](img_resolution=8, in_channels=4,
                                label_dropout=0.1, num_classes=10,
                                learn_sigma=True)
    ref.eval()
    with torch.no_grad():
        for p in ref.parameters():
            if p.requires_grad and p.abs().sum() == 0:
                p.copy_(torch.randn_like(p) * 0.05)

    from lfm_tpu.nn.dit import DIT_CONFIGS, DiT
    from lfm_tpu.ode.cfg import cfg_velocity

    depth, hidden, patch, heads = DIT_CONFIGS["DiT-S/2"]
    mine = DiT(img_resolution=8, patch_size=patch, in_channels=4,
               hidden_size=hidden, depth=depth, num_heads=heads,
               num_classes=10, label_dropout=0.1, learn_sigma=True)
    params = convert_dit_state_dict(ref.state_dict(), depth=depth,
                                    scan_blocks=True)

    rng = np.random.default_rng(11)
    n = 2
    half = rng.normal(size=(n, 4, 8, 8)).astype(np.float32)
    x2 = np.concatenate([half, half], axis=0)
    y2 = np.array([3, 7, 10, 10], np.int64)  # null class == num_classes
    t2 = np.full((2 * n,), 0.5, np.float32)

    with torch.no_grad():
        want = ref.forward_with_cfg(torch.from_numpy(t2), torch.from_numpy(x2),
                                    torch.from_numpy(y2), cfg_scale=1.5).numpy()
    assert want.shape == (2 * n, 8, 8, 8)

    got = mine.forward_with_cfg(
        params, jnp.asarray(t2), jnp.asarray(x2.transpose(0, 2, 3, 1)),
        jnp.asarray(y2), cfg_scale=1.5)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=5e-4, atol=5e-5)

    # cfg_velocity (half-state batching, sample/sample.py path) must agree
    # with the doubled-batch reference on the first half
    apply = lambda tt, xx, yy: mine.apply(params, tt, xx, yy)
    v = cfg_velocity(apply, jnp.asarray(y2[:n]), jnp.asarray(y2[n:]),
                     cfg_scale=1.5, guide_channels=4)
    got_half = v(0.5, jnp.asarray(half.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_half).transpose(0, 3, 1, 2),
                               want[:n], rtol=5e-4, atol=5e-5)
