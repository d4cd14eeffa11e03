"""COUNTLESS segmentation downsampling (2D and 3D), numpy- and JAX-native.

Re-implements the capability of the reference's vendored COUNTLESS benchmark
(reference datasets_prep/inpaint_preprocess/masks/countless/countless2d.py:26-51
and countless3d.py:44-68): downsample a label map by 2x per axis, emitting the
*mode* of each 2x2 (or 2x2x2) block, computed with pure elementwise vector ops
(no per-block Python loops, no histogram).

Algorithm (Silversmith's COUNTLESS): for a block of K pixels, a value is the
mode iff some m-subset of positions all hold it, for the largest such m.
Checking every position-subset of size floor(K/2)..2 with elementwise
equality+select finds it; if no value repeats, the last position wins. Zeros
would defeat the ``x + (x == 0) * y`` select chain, so the input is shifted by
+1 first (upcasting when the dtype cannot hold max+1) and shifted back at the
end.

Tie-breaking is therefore *positional* (the first matching position-subset in
lexicographic order wins), matching the reference exactly; see
``tests/test_countless.py`` for the brute-force oracle.

Differences from the reference (deliberate, TPU-first):
- Batched: any number of leading axes; only the trailing 2 (or 3) spatial
  axes are downsampled. The reference operates on single 2D/3D arrays.
- Works under ``jax.numpy`` unchanged (pass ``xp=jnp``) — every op is
  elementwise, so XLA fuses the whole reduction into one kernel; used to
  downsample semantic maps on-device in the semantic-synthesis cond path.
- One implementation, not eleven benchmark variants; ``python -m
  lfm_tpu.data.countless`` reproduces the reference's MPx/s benchmark
  harness (countless2d.py:420-539) on synthetic label maps.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np

__all__ = ["countless2d", "countless3d", "downsample_segmentation"]


def _sections(data, factor, xp):
    """Split trailing ``len(factor)`` axes into strided sub-arrays, one per
    in-block position, ordered lexicographically (position 0 first)."""
    nd = len(factor)
    lead = (slice(None),) * (data.ndim - nd)
    out = []
    for offset in np.ndindex(*factor):
        out.append(data[lead + tuple(slice(o, None, f) for o, f in zip(offset, factor))])
    return out


def _shift_dtype(data, xp):
    """Dtype that can represent data.max() + 1 (for the zero shift)."""
    dt = data.dtype
    if np.issubdtype(dt, np.unsignedinteger):
        # uint8 label maps legitimately contain 255; the shift needs headroom
        return xp.uint16 if np.iinfo(dt).bits == 8 else dt
    if np.issubdtype(dt, np.signedinteger):
        return xp.int16 if np.iinfo(dt).bits == 8 else dt
    raise TypeError(f"countless needs an integer label map, got {dt}")


def _lor(x, y):
    """Select chain: x where nonzero, else y (both zero-shifted)."""
    return x + (x == 0) * y


def _countless(data, factor, xp):
    odt = data.dtype
    wide = _shift_dtype(data, xp)
    parts = [p.astype(wide) + 1 for p in _sections(data, factor, xp)]
    k = len(parts)

    # A value occupying > floor(k/2) positions also occupies some
    # floor(k/2)-subset, and no rival can tie it there — so subset sizes
    # 2..floor(k/2) suffice. Build levels bottom-up (an m-subset's
    # all-equal value derives from its (m-1)-prefix), but chain the final
    # select with LARGEST m first: a triple-match outranks any pair-match.
    levels = {}  # m -> lor-chain over all m-subset matches, combination order
    memo = {(i,): parts[i] for i in range(k)}  # previous level's subsets
    for m in range(2, k // 2 + 1):
        acc = None
        nxt = {}
        for idx in combinations(range(k), m):
            prefix = memo[idx[:-1]]
            val = prefix * (prefix == parts[idx[-1]])
            nxt[idx] = val
            if m == 2 and idx[-1] == k - 1:
                continue  # a lone pair with the fallback position: the
                # fallback term below returns the same value anyway
            acc = val if acc is None else _lor(acc, val)
        levels[m] = acc
        memo = nxt
    result = parts[-1]  # fallback: last in-block position
    for m in sorted(levels):
        result = _lor(levels[m], result)
    return (result - 1).astype(odt)


def _resolve_xp(data, xp):
    if xp is not None:
        return xp
    if isinstance(data, np.ndarray):
        return np
    import jax.numpy as jnp  # jax arrays (incl. tracers)

    return jnp


def countless2d(data, xp=None):
    """Mode-downsample the trailing 2 axes by 2x (2x2 blocks).

    ``data``: integer label map, trailing axes even-sized. Returns the same
    dtype with trailing axes halved. ``xp``: numpy (default for ndarrays) or
    jax.numpy (default for jax arrays / tracers).
    """
    xp = _resolve_xp(data, xp)
    if data.shape[-1] % 2 or data.shape[-2] % 2:
        raise ValueError(f"trailing axes must be even, got {data.shape}")
    return _countless(data, (2, 2), xp)


def countless3d(data, xp=None):
    """Mode-downsample the trailing 3 axes by 2x (2x2x2 blocks)."""
    xp = _resolve_xp(data, xp)
    if any(data.shape[i] % 2 for i in (-3, -2, -1)):
        raise ValueError(f"trailing axes must be even, got {data.shape}")
    return _countless(data, (2, 2, 2), xp)


def downsample_segmentation(seg, factor: int, xp=None):
    """Repeated countless2d until the trailing 2 axes shrink by ``factor``
    (a power of two). The mode-of-modes is the standard mip-chain for label
    maps (what the reference uses COUNTLESS for in its inpainting masks)."""
    if factor < 1 or factor & (factor - 1):
        raise ValueError(f"factor must be a power of two, got {factor}")
    while factor > 1:
        seg = countless2d(seg, xp=xp)
        factor //= 2
    return seg


def _benchmark():  # pragma: no cover - manual harness
    """MPx/s benchmark on a synthetic label map (reference
    countless2d.py:420-539 equivalent, no image-file dependency)."""
    import time

    rng = np.random.default_rng(0)
    img = rng.integers(0, 40, size=(2048, 2048), dtype=np.uint8)
    # warm
    countless2d(img)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        countless2d(img)
    dt = (time.perf_counter() - t0) / n
    mpx = img.size / dt / 1e6
    print(f"countless2d: {mpx:,.1f} MPx/s ({dt * 1e3:.2f} ms / 2048x2048 uint8)")

    vol = rng.integers(0, 40, size=(256, 256, 256), dtype=np.uint8)
    countless3d(vol)
    t0 = time.perf_counter()
    for _ in range(5):
        countless3d(vol)
    dt = (time.perf_counter() - t0) / 5
    print(f"countless3d: {vol.size / dt / 1e6:,.1f} MPx/s ({dt * 1e3:.2f} ms / 256^3 uint8)")


if __name__ == "__main__":  # pragma: no cover
    _benchmark()
