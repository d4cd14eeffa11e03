"""Deterministic, world-size-invariant sampling RNG.

TPU-native replacement for the reference's generator zoo
(reference sampler/random_util.py:14-173): the reference draws one global
``(num_samples, ...)`` tensor from a seeded torch RNG and lets each rank
index a strided slice, guaranteeing the generated 50k-image FID set is
invariant to world size and batch size.

Here the same invariance holds *by construction* with counter-based keys:
sample ``i`` always uses ``fold_in(key(seed), i)``, so any shard of the
sample-index space on any mesh shape draws identical noise. No global
tensor is materialised and no collective is needed.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _per_sample_normal(seed: int, index: jnp.ndarray, shape: Tuple[int, ...], dtype) -> jnp.ndarray:
    key = jax.random.fold_in(jax.random.PRNGKey(seed), index)
    return jax.random.normal(key, shape, dtype)


def _per_sample_randint(seed: int, index: jnp.ndarray, low: int, high: int) -> jnp.ndarray:
    # fold_in a distinct stream tag so class draws never alias noise draws
    key = jax.random.fold_in(jax.random.PRNGKey(seed), index)
    key = jax.random.fold_in(key, 0x7FFF)
    return jax.random.randint(key, (), low, high)


class SampleRNG:
    """Counter-based generator keyed by *global sample index*.

    Equivalent in role to ``DeterministicGenerator``
    (reference sampler/random_util.py:36-97): `randn(indices, shape)` returns
    the noise for those global sample indices regardless of how the index
    space is sharded over hosts/devices.
    """

    def __init__(self, seed: int = 0, num_samples: int = 0):
        self.seed = int(seed)
        self.num_samples = int(num_samples)

    def randn(self, indices: jnp.ndarray, sample_shape: Sequence[int], dtype=jnp.float32) -> jnp.ndarray:
        """Draw N(0,1) of shape ``(len(indices), *sample_shape)``."""
        indices = jnp.asarray(indices, jnp.int32)
        return jax.vmap(lambda i: _per_sample_normal(self.seed, i, tuple(sample_shape), dtype))(indices)

    def randint(self, indices: jnp.ndarray, low: int, high: int) -> jnp.ndarray:
        """Per-sample class labels (reference test_flow_latent.py:167)."""
        indices = jnp.asarray(indices, jnp.int32)
        return jax.vmap(lambda i: _per_sample_randint(self.seed, i, low, high))(indices)

    def batch_indices(self, done: int, batch: int, rank: int = 0, world_size: int = 1) -> jnp.ndarray:
        """Rank-strided global indices for the next batch, mirroring the
        reference's interleaved assignment (sampler/random_util.py:58-67)."""
        idx = done + rank + world_size * jnp.arange(batch, dtype=jnp.int32)
        if self.num_samples:
            idx = jnp.clip(idx, 0, self.num_samples - 1)
        return idx


class DummyRNG:
    """Stateful convenience generator (reference DummyGenerator,
    sampler/random_util.py:25-33): fresh draws from a split key each call."""

    def __init__(self, seed: int = 0):
        self._key = jax.random.PRNGKey(seed)

    def _next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def randn(self, shape: Sequence[int], dtype=jnp.float32) -> jnp.ndarray:
        return jax.random.normal(self._next(), tuple(shape), dtype)

    def randint(self, low: int, high: int, shape: Sequence[int]) -> jnp.ndarray:
        return jax.random.randint(self._next(), tuple(shape), low, high)

    def randn_like(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.randn(x.shape, x.dtype)


def get_generator(kind: str, num_samples: int = 0, seed: int = 0):
    """Name-compatible factory (reference sampler/random_util.py:14-22).

    ``determ`` and ``determ-indiv`` collapse to the same counter-based
    implementation — both reference variants exist only to realise
    per-sample determinism, which `SampleRNG` provides natively.
    """
    if kind == "dummy":
        return DummyRNG(seed)
    if kind in ("determ", "determ-indiv"):
        return SampleRNG(seed=seed, num_samples=num_samples)
    raise NotImplementedError(f"unknown generator kind {kind!r}")
