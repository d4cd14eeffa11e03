"""Parameter partitioning: FSDP and tensor-parallel shardings.

The reference is data-parallel only (SURVEY.md §2.3 — largest model fits
per-device). These helpers are the TPU-idiomatic scale-out extensions: give
parameters NamedShardings over the ``fsdp``/``tensor`` mesh axes and let
XLA's SPMD partitioner insert the all-gathers/reduce-scatters — no code
changes in models or the train step.

* FSDP: each large parameter is sharded along its largest dimension over the
  ``fsdp`` axis (weights gather at use, optimizer state stays sharded) —
  ZeRO-3-style memory scaling.
* Tensor parallel (DiT): Megatron-style column/row split of the attention
  qkv/proj and MLP fc1/fc2 kernels over the ``tensor`` axis; XLA inserts the
  all-reduce after the row-parallel matmuls.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lfm_tpu.core.sharding import FSDP_AXIS, TENSOR_AXIS


def _largest_divisible_dim(shape, n: int) -> Optional[int]:
    """Index of the largest dim divisible by n, else None."""
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] >= n and shape[i] % n == 0:
            return i
    return None


def fsdp_shardings(params: Any, mesh: Mesh, min_size: int = 2 ** 16) -> Any:
    """Pytree of NamedShardings: params >= min_size elements shard their
    largest divisible dim over the fsdp axis; small params replicate."""
    n_fsdp = mesh.shape[FSDP_AXIS]

    def rule(x):
        shape = np.shape(x)
        if n_fsdp > 1 and np.prod(shape, dtype=np.int64) >= min_size:
            dim = _largest_divisible_dim(shape, n_fsdp)
            if dim is not None:
                spec = [None] * len(shape)
                spec[dim] = FSDP_AXIS
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


# DiT tensor-parallel rules keyed on (parent module, leaf module) names.
# kernels are (in, out) — scanned blocks prepend a layer dim, handled below.
_DIT_TP_RULES = {
    ("attn", "qkv"): "col",    # split heads: output dim
    ("attn", "proj"): "row",   # row-parallel: input dim (all-reduce after)
    ("mlp", "fc1"): "col",
    ("mlp", "fc2"): "row",
}


def dit_tp_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedShardings implementing Megatron-style TP for nn/dit.py params."""
    n_tp = mesh.shape[TENSOR_AXIS]

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        shape = np.shape(tree)
        kind = None
        for (parent, leaf), k in _DIT_TP_RULES.items():
            if parent in path and leaf in path:
                kind = k
        if n_tp > 1 and kind and path[-1] == "kernel" and len(shape) >= 2:
            dim = len(shape) - 1 if kind == "col" else len(shape) - 2
            if shape[dim] % n_tp == 0:
                spec = [None] * len(shape)
                spec[dim] = TENSOR_AXIS
                return NamedSharding(mesh, P(*spec))
        if n_tp > 1 and kind == "col" and path[-1] == "bias" and shape and shape[-1] % n_tp == 0:
            spec = [None] * len(shape)
            spec[-1] = TENSOR_AXIS
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return walk(params, ())


def combined_shardings(params: Any, mesh: Mesh, *, tp_rules: str = "none",
                       fsdp_min_size: int = 2 ** 16) -> Any:
    """TP rules take precedence; everything else falls to FSDP/replicated."""
    fsdp = fsdp_shardings(params, mesh, fsdp_min_size)
    if tp_rules == "dit":
        tp = dit_tp_shardings(params, mesh)

        def merge(t, f):
            return t if t.spec != P() else f

        return jax.tree_util.tree_map(merge, tp, fsdp)
    return fsdp


def shard_params(params: Any, shardings: Any) -> Any:
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
