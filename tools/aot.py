"""AOT executable cache: skip the remote cold compile on the axon tunnel.

The axon TPU tunnel's remote compiler takes 10-20 minutes cold for the big
sampling programs (Pallas kernels + ODE scan) and the JAX persistent
compilation cache does not get hits through it. That cost blew the driver's
bench budget two rounds in a row (BENCH_r02/r03: zero live stages).

This module caches *serialized compiled executables*
(``jax.experimental.serialize_executable``) under ``tools/aot/``, keyed by a
SHA-256 over (jax version, device kind, StableHLO text of the lowered
program). The key makes the cache provably coherent: any change to model
code, shapes, dtypes, or flags changes the lowered program text and misses.
Tracing + lowering is host-side and cheap; only the backend compile is
skipped. Deserialization round-trip measured on the v5e tunnel: <0.3 s
(first-ever load on a cold server ~2-3 min, still far under a cold compile).

Used by bench.py so a driver run with a committed cache executes every stage
nearly compile-free; on any miss or load failure it falls back to a normal
``lowered.compile()`` transparently.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import pickle
import sys
import time

AOT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "aot")

# The cache IS committed (tools/aot/*.bin, ~1-36 MB gzipped each): rounds 2-3
# proved that uncommitted artifacts do not survive to the driver's bench run,
# which then pays 10-20 min cold compiles per stage and times out. The key
# embeds jax version + device kind + program text, so a mismatched environment
# simply misses and recompiles. Regenerate with `python tools/gen_aot_cache.py`.


def _read(path: str):
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    return pickle.loads(raw)


def _write(path: str, obj) -> int:
    raw = gzip.compress(pickle.dumps(obj), compresslevel=1)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(raw)
    os.replace(tmp, path)
    return len(raw)


def _log(msg: str) -> None:
    print(f"[aot] {msg}", file=sys.stderr, flush=True)


class LowerOnlyDone(Exception):
    """Raised by ``jit_cached`` in AOT_LOWER_ONLY mode once the named
    program has been lowered and its cache key checked — no deserialize,
    no backend compile, no execution. Lets tools/check_aot_drift.py verify
    the committed cache against the CURRENT lowerings in seconds per stage
    instead of re-running the full bench sweep."""

    def __init__(self, name: str, key: str, hit: bool):
        super().__init__(f"{name}: {'HIT' if hit else 'MISS'} key={key}")
        self.name, self.key, self.hit = name, key, hit


def fingerprint(lowered) -> str:
    """Cache key: jax version + device kind + lowered StableHLO text."""
    import jax

    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    h.update(jax.devices()[0].device_kind.encode())
    h.update(lowered.as_text().encode())
    return h.hexdigest()[:20]


def jit_cached(name: str, fn, example_args, *, donate_argnums=(),
               save: bool = True):
    """jit ``fn``, but load the compiled executable from the AOT cache when
    the lowered program matches a cached entry (and serialize it on a miss).

    ``example_args`` must have the call-time shapes/dtypes (concrete arrays
    or ShapeDtypeStructs). Returns a callable Compiled stage.
    """
    import jax

    jitted = jax.jit(fn, donate_argnums=donate_argnums)
    t0 = time.time()
    lowered = jitted.lower(*example_args)
    key = fingerprint(lowered)
    _log(f"{name}: lower+hash {time.time() - t0:.1f}s key={key}")
    path = os.path.join(AOT_DIR, f"{name}-{key}.bin")
    lower_only = {n for n in
                  os.environ.get("AOT_LOWER_ONLY", "").split(",") if n}
    if name in lower_only:
        hit = os.path.exists(path)
        _log(f"{name}: CHECK {'HIT' if hit else 'MISS'} "
             f"({os.path.basename(path)})")
        raise LowerOnlyDone(name, key, hit)
    if os.path.exists(path):
        try:
            from jax.experimental.serialize_executable import (
                deserialize_and_load)

            entry = _read(path)
            payload, in_tree, out_tree, dev_ids = entry
            t0 = time.time()
            by_id = {d.id: d for d in jax.devices()}
            compiled = deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=[by_id[i] for i in dev_ids])
            _log(f"{name}: AOT cache hit, load {time.time() - t0:.1f}s")
            return compiled
        except Exception as e:  # stale jaxlib, runtime mismatch, corrupt file
            _log(f"{name}: AOT load failed ({type(e).__name__}: {e}); "
                 "recompiling")
    else:
        _log(f"{name}: AOT cache miss ({os.path.basename(path)})")
    t0 = time.time()
    compiled = lowered.compile()
    _log(f"{name}: backend compile {time.time() - t0:.1f}s")
    if save:
        try:
            from jax.experimental.serialize_executable import serialize

            payload, in_tree, out_tree = serialize(compiled)
            # record the device assignment: deserialize_and_load defaults to
            # ALL local devices, which breaks a 1-device executable loaded
            # in a multi-device process (e.g. the 8-device CPU test mesh)
            dev_ids = [d.id for d in
                       compiled.runtime_executable().local_devices()]
            os.makedirs(AOT_DIR, exist_ok=True)
            nbytes = _write(path, (payload, in_tree, out_tree, dev_ids))
            _log(f"{name}: serialized {len(payload)} -> {nbytes} bytes "
                 f"gzipped -> {path}")
        except Exception as e:  # serialization unsupported on this backend
            _log(f"{name}: AOT save failed ({type(e).__name__}: {e})")
    return compiled
