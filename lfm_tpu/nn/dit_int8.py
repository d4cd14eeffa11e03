"""Int8 (w8a8) DiT sampling path: dynamic-quantized dense layers on the MXU.

DiT sampling FLOPs are ~96% dense matmuls (qkv/proj/fc1/fc2; attention at
T=256 is ~4%). This module quantizes the transformer-block weight matrices
ONCE (symmetric int8, per-output-channel scales) and evaluates each block
with dynamically per-token-quantized activations:

    y = (int8(x) @ int8(W)) [int32 accumulate] * s_x[:, None] * s_w[None, :]

Everything else — LayerNorm statistics, adaLN modulation, residual stream,
softmax attention, embedders, final layer — keeps the bf16/f32 numerics of
the fused sampling path (nn/dit_fused.py), so quantization error enters
only through the four big matmuls per block. Measured output error vs the
bf16 path is bounded in tests/test_dit_int8.py.

This is an OPT-IN path beyond the reference's feature set (the reference
samples in fp32/tf32, reference test_flow_latent.py:161-194); the benchmark
headline stays bf16 and the int8 numbers are recorded separately (bench.py
stage "int8"). Pure XLA — jnp only — so it runs identically under jit on
TPU (int8 MXU) and CPU (tests).

MEASURED VERDICT (v5e; batch curve 2026-08-19, tools/int8_scope.py): int8
is a WEIGHT-BANDWIDTH play on this chip, not a compute play — XLA's int8
dot sustains 194.9 TOP/s, the bf16 peak (197 TFLOP/s), NOT the datasheet's
2x rate (tools/microbench_int8.py; a Pallas pipeline is no better,
tools/microbench_int8_pallas.py). It therefore wins exactly the batches
where each NFE streams the weight tree from HBM (int8 halves the bytes of
the four quantized matmuls, 302M of 458M params) and loses where the MXU
is the limit:

    batch          1      2      4      8      16     32     64
    int8/bf16    1.17x  0.99x  1.06x  1.09x  1.09x  0.91x  0.70x

Peak: 9.97 samples/s at bs16 — above the 9.13 bf16 cross-batch optimum.
Quality: inception-stats Fréchet shift 8.4e-11 vs the bf16 path at n=256
on the calibrated perturbed-weight field (tools/int8_evidence.py, same
protocol as the eval_noise deviation), feature relRMS 1.4e-3. The bench
HEADLINE stays bf16: the evidence field has no trained-model activation
outliers, so the FID-invisibility is protocol-level — w8a8 on a released
checkpoint still needs the one-command FID rerun before the 9.97 can be
claimed at quality parity. int8 is the right opt-in for throughput-bound
serving at small/medium batch and for the halved resident weight footprint.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from lfm_tpu.nn.dit_fused import _dense
from lfm_tpu.nn.layers import get_2d_sincos_pos_embed, timestep_embedding

_LN_EPS = 1e-6
# keys under blocks/block/ whose Dense kernels are quantized; adaLN stays
# bf16 (an (N, C) x (C, 6C) matmul over N rows — negligible FLOPs, and its
# output modulates everything, so it is kept exact)
_QUANT_PATHS = (("attn", "qkv"), ("attn", "proj"), ("mlp", "fc1"),
                ("mlp", "fc2"))


def quantize_weight(w: jnp.ndarray):
    """Symmetric per-output-channel int8: w ~= q * s, s per last axis.

    Works on both a single (K, N) kernel and the scan-stacked (L, K, N)
    layout — the reduction axis is always -2 (in_features)."""
    m = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    s = jnp.maximum(m, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s  # s keeps the keepdims (…, 1, N) shape


def quantize_params_int8(model, variables: Dict[str, Any]) -> Dict[str, Any]:
    """One-time conversion of a DiT (scan_blocks) param tree for
    ``dit_int8_apply``: block matmul kernels -> {"q": int8, "s": f32};
    everything else cast to bf16 (same policy as
    dit_fused.cast_params_bf16)."""
    p = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)
    blocks = dict(p["params"]["blocks"]["block"])
    for outer, inner in _QUANT_PATHS:
        grp = dict(blocks[outer])
        lay = dict(grp[inner])
        q, s = quantize_weight(variables["params"]["blocks"]["block"]
                               [outer][inner]["kernel"])
        lay["kernel"] = {"q": q, "s": s}
        grp[inner] = lay
        blocks[outer] = grp
    params = dict(p["params"])
    b = dict(params["blocks"])
    b["block"] = blocks
    params["blocks"] = b
    out = dict(p)
    out["params"] = params
    return out


def int8_model_ok(model) -> bool:
    """Model-only eligibility: a scan-blocks DiT with head-dividing width.
    Unlike the Pallas fused path this is pure XLA — no batch/sequence tiling
    constraint — so eligibility is decidable before the input shape is
    known, which lets make_sampler pre-quantize the param tree once."""
    from lfm_tpu.nn.dit import DiT  # local import to avoid cycle

    if not isinstance(model, DiT) or not model.scan_blocks:
        return False
    return model.hidden_size % model.num_heads == 0


def int8_applicable(model, x: jnp.ndarray) -> bool:
    """Trace-time gate for dispatch sites that hold an input. The pure-XLA
    int8 path has no input-shape constraint, so this is the model-only
    check; any backend qualifies (CPU runs the same program in tests) —
    int8 MXU speed needs a TPU."""
    del x
    return int8_model_ok(model)


def _quant_rows(x: jnp.ndarray):
    """Dynamic symmetric per-row (per-token) activation quantization."""
    xf = x.astype(jnp.float32)
    m = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(m, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _dense_int8(x: jnp.ndarray, kernel: Dict[str, jnp.ndarray],
                bias: Optional[jnp.ndarray]) -> jnp.ndarray:
    """(rows, K) x quantized (K, N) -> f32 (rows, N): int8 MXU dot with
    int32 accumulate, then the f32 dequant epilogue (XLA fuses it)."""
    qx, sx = _quant_rows(x)
    y = jax.lax.dot_general(qx, kernel["q"], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sx * kernel["s"].reshape(1, -1)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


def _layernorm_f32(x: jnp.ndarray) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu)
    return (x - mu) * jax.lax.rsqrt(var + _LN_EPS)


def _attention_bf16(qkv: jnp.ndarray, n: int, t: int, heads: int,
                    head_dim: int) -> jnp.ndarray:
    """Plain bf16 softmax attention with f32 logits, (N*T, 3C) -> (N*T, C).
    ~4% of block FLOPs at T=256 — not worth quantizing (softmax needs the
    f32 island anyway; reference keeps fp32 attention EDM.py:160-179)."""
    c = heads * head_dim
    qkv = qkv.reshape(n, t, 3, heads, head_dim).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (N, H, T, hd) bf16
    logits = jax.lax.dot_general(
        q, k, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32) / jnp.sqrt(
            jnp.float32(head_dim))
    p = jax.nn.softmax(logits, axis=-1)
    o = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)  # (N, H, T, hd)
    return o.astype(jnp.bfloat16).transpose(0, 2, 1, 3).reshape(n * t, c)


def dit_int8_apply(model, qvariables: Dict[str, Any], t: jnp.ndarray,
                   x: jnp.ndarray, y: Optional[jnp.ndarray] = None
                   ) -> jnp.ndarray:
    """Forward equivalent to ``model.apply`` in eval mode with the block
    matmuls running int8. ``qvariables`` must come from
    ``quantize_params_int8`` (pass through jit as an ARGUMENT). Mirrors
    dit_fused.dit_fused_apply's dataflow (nn/dit.py:182-242, reference
    models/DiT.py:231-272); residual stream f32."""
    p = qvariables["params"]
    n, hh, ww, cc = x.shape
    ps = model.patch_size
    d = model.hidden_size
    heads = model.num_heads
    hd = d // heads

    t = jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(-1), (n,))
    if y is None:
        y = jnp.full((n,), model.null_label, jnp.int32)

    # patchify + embedders: identical to the fused path (bf16)
    xt = x.reshape(n, hh // ps, ps, ww // ps, ps, cc)
    xt = xt.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, (hh // ps) * (ww // ps), ps * ps * cc)
    xt = _dense(xt, p["x_embedder"]["proj"])
    pos = get_2d_sincos_pos_embed(d, hh // ps)
    xt = xt + pos[None].astype(xt.dtype)

    te = timestep_embedding(t, 256).astype(jnp.bfloat16)
    te = _dense(te, p["t_embedder"]["fc1"])
    te = _dense(jax.nn.silu(te), p["t_embedder"]["fc2"])
    ye = p["y_embedder"]["embedding"][y].astype(jnp.bfloat16)
    c = te + ye
    silu_c = jax.nn.silu(c)

    tok = xt.shape[1]
    rows = n * tok

    def body(carry, bp):
        mod = _dense(silu_c, bp["adaLN_modulation"]).astype(
            jnp.float32).reshape(n, 6, 1, d)
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = (
            mod[:, i] for i in range(6))

        xf = carry  # (N, T, C) f32 residual stream
        h = _layernorm_f32(xf) * (1.0 + sc_msa) + sh_msa
        qkv = _dense_int8(h.reshape(rows, d), bp["attn"]["qkv"]["kernel"],
                          bp["attn"]["qkv"]["bias"])
        attn = _attention_bf16(qkv.astype(jnp.bfloat16), n, tok, heads, hd)
        proj = _dense_int8(attn, bp["attn"]["proj"]["kernel"],
                           bp["attn"]["proj"]["bias"])
        xf = xf + g_msa * proj.reshape(n, tok, d)

        h = _layernorm_f32(xf) * (1.0 + sc_mlp) + sh_mlp
        h1 = _dense_int8(h.reshape(rows, d), bp["mlp"]["fc1"]["kernel"],
                         bp["mlp"]["fc1"]["bias"])
        h1 = jax.nn.gelu(h1, approximate=True)
        h2 = _dense_int8(h1, bp["mlp"]["fc2"]["kernel"],
                         bp["mlp"]["fc2"]["bias"])
        xf = xf + g_mlp * h2.reshape(n, tok, d)
        return xf, None

    xf, _ = jax.lax.scan(body, xt.astype(jnp.float32),
                         p["blocks"]["block"])

    fl = p["final_layer"]
    mod = _dense(silu_c, fl["adaLN_modulation"]).astype(jnp.float32)
    shift, scale = jnp.split(mod, 2, axis=-1)
    xf = _layernorm_f32(xf)
    xt = (xf * (1.0 + scale[:, None, :]) + shift[:, None, :]
          ).astype(jnp.bfloat16)
    xt = _dense(xt, fl["linear"])

    g = hh // ps
    co = model.out_channels
    xt = xt.reshape(n, g, g, ps, ps, co).transpose(0, 1, 3, 2, 4, 5)
    return xt.reshape(n, g * ps, g * ps, co).astype(jnp.float32)
