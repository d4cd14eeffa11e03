"""Text / token-sequence condition encoder (BERT-style).

TPU-native equivalent of the reference's BERTEmbedder + vendored minimal
x-transformers (reference models/encoder.py:16-87, models/x_transformer.py):
a pre-norm transformer encoder over BERT-tokenized text (or any token
sequence, e.g. the layout conditional builders' bbox tokens), producing the
(N, 77, 512)-style context the cross-attention UNets consume.

Tokenization uses HuggingFace's ``bert-base-uncased`` fast tokenizer when a
local copy is available (the reference downloads it, encoder.py:23); a
hash-bucket whitespace tokenizer is the offline fallback.
"""

from __future__ import annotations

import hashlib
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class EncoderBlock(nn.Module):
    """Pre-norm self-attention + GELU MLP (x_transformer.py Attention:207 /
    AttentionLayers:359 defaults: 8 heads, head dim 64, ff mult 4)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    ff_mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        inner = self.heads * self.dim_head
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(h)
        n, t, _ = q.shape
        q = q.reshape(n, t, self.heads, self.dim_head)
        k = k.reshape(n, t, self.heads, self.dim_head)
        v = v.reshape(n, t, self.heads, self.dim_head)
        sim = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                         preferred_element_type=jnp.float32) * (self.dim_head ** -0.5)
        if mask is not None:
            sim = jnp.where(mask[:, None, None, :], sim, jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
        o = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, t, inner)
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="to_out")(o)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.dim * self.ff_mult, dtype=self.dtype, name="ff_in")(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="ff_out")(h)
        return x


class TransformerTextEncoder(nn.Module):
    """TransformerWrapper equivalent (x_transformer.py:529): token + absolute
    position embeddings -> depth x EncoderBlock -> final LayerNorm; returns
    embeddings (return_embeddings=True path used by BERTEmbedder)."""

    dim: int = 512
    depth: int = 8
    vocab_size: int = 30522
    max_seq_len: int = 77
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, mask=None) -> jnp.ndarray:
        tok = self.param("token_emb", nn.initializers.normal(0.02),
                         (self.vocab_size, self.dim))
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (self.max_seq_len, self.dim))
        t = tokens.shape[1]
        x = tok[tokens].astype(self.dtype) + pos[:t][None].astype(self.dtype)
        for i in range(self.depth):
            x = EncoderBlock(self.dim, dtype=self.dtype, name=f"block_{i}")(x, mask)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_final")(x)


class SimpleTokenizer:
    """Offline fallback: lowercase whitespace split, stable hash buckets into
    the BERT vocab range, [CLS]/[SEP]/[PAD] at BERT's conventional ids."""

    CLS, SEP, PAD = 101, 102, 0

    def __init__(self, max_length: int = 77, vocab_size: int = 30522):
        self.max_length = max_length
        self.vocab_size = vocab_size

    def _tok(self, word: str) -> int:
        h = int(hashlib.md5(word.encode()).hexdigest(), 16)
        start = min(1000, self.vocab_size // 2)
        return start + h % (self.vocab_size - start)

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        out = np.full((len(texts), self.max_length), self.PAD, np.int32)
        for i, text in enumerate(texts):
            ids = [self.CLS] + [self._tok(w) for w in text.lower().split()]
            ids = ids[: self.max_length - 1] + [self.SEP]
            out[i, : len(ids)] = ids
        return out


def get_bert_tokenizer(max_length: int = 77, local_path: Optional[str] = None):
    """HF BertTokenizerFast when available locally, else SimpleTokenizer."""
    try:
        from transformers import BertTokenizerFast

        src = local_path or "bert-base-uncased"
        tk = BertTokenizerFast.from_pretrained(src, local_files_only=local_path is not None)

        def tokenize(texts: Sequence[str]) -> np.ndarray:
            enc = tk(list(texts), truncation=True, max_length=max_length,
                     padding="max_length", return_tensors="np")
            return enc["input_ids"].astype(np.int32)

        return tokenize
    except Exception:
        return SimpleTokenizer(max_length)


class BERTEmbedder:
    """(reference models/encoder.py:52-87): tokenizer + transformer encoder.
    Functional: hold the flax module + params, call on raw strings or tokens."""

    def __init__(self, n_embed: int = 512, n_layer: int = 8, vocab_size: int = 30522,
                 max_seq_len: int = 77, tokenizer=None, dtype=jnp.float32):
        self.model = TransformerTextEncoder(
            dim=n_embed, depth=n_layer, vocab_size=vocab_size,
            max_seq_len=max_seq_len, dtype=dtype,
        )
        self.tokenizer = tokenizer or get_bert_tokenizer(max_seq_len)
        self.max_seq_len = max_seq_len

    def init(self, key: jax.Array):
        dummy = jnp.zeros((1, self.max_seq_len), jnp.int32)
        return self.model.init(key, dummy)

    def encode(self, params, text_or_tokens) -> jnp.ndarray:
        if isinstance(text_or_tokens, (list, tuple)) and (
            len(text_or_tokens) == 0 or isinstance(text_or_tokens[0], str)
        ):
            tokens = jnp.asarray(self.tokenizer(list(text_or_tokens)))
        else:
            tokens = jnp.asarray(text_or_tokens, jnp.int32)
        return self.model.apply(params, tokens)


def convert_text_encoder_state_dict(sd, depth: int = 8):
    """Torch BERTEmbedder/TransformerWrapper state dict -> flax params for
    ``TransformerTextEncoder`` (reference models/encoder.py:52-87,
    x_transformer.py:207-617).

    Reference layout: ``transformer.attn_layers.layers.{j}`` alternates
    attention (even j: norm + Attention) and feed-forward (odd j: norm +
    FeedForward(Sequential(Sequential(Linear, GELU), Dropout, Linear)));
    final norm is ``transformer.norm``. Torch Linear weights are (out, in)
    and transpose to flax (in, out) kernels.
    """
    import numpy as np

    def g(name):
        for prefix in ("", "transformer.", "module.", "module.transformer."):
            key = prefix + name
            if key in sd:
                v = sd[key]
                return np.asarray(v.detach().cpu().numpy()
                                  if hasattr(v, "detach") else v)
        raise KeyError(name)

    def lin(name):
        return g(name + ".weight").T

    def ln(name):
        return {"scale": g(name + ".weight"), "bias": g(name + ".bias")}

    params = {
        "token_emb": g("token_emb.weight"),
        "pos_emb": g("pos_emb.emb.weight"),
        "norm_final": ln("norm"),
    }
    for i in range(depth):
        a, f = 2 * i, 2 * i + 1
        ap = f"attn_layers.layers.{a}"
        fp = f"attn_layers.layers.{f}"
        params[f"block_{i}"] = {
            "norm1": ln(f"{ap}.0"),
            "to_q": {"kernel": lin(f"{ap}.1.to_q")},
            "to_k": {"kernel": lin(f"{ap}.1.to_k")},
            "to_v": {"kernel": lin(f"{ap}.1.to_v")},
            "to_out": {"kernel": lin(f"{ap}.1.to_out"),
                       "bias": g(f"{ap}.1.to_out.bias")},
            "norm2": ln(f"{fp}.0"),
            "ff_in": {"kernel": lin(f"{fp}.1.net.0.0"),
                      "bias": g(f"{fp}.1.net.0.0.bias")},
            "ff_out": {"kernel": lin(f"{fp}.1.net.2"),
                       "bias": g(f"{fp}.1.net.2.bias")},
        }
    import jax.numpy as jnp

    return {"params": jax.tree_util.tree_map(jnp.asarray, params)}
