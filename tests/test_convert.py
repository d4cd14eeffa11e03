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
