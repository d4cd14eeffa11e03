"""Probe: int8 matmul + dequant epilogue INSIDE a Pallas TPU kernel.

Decides whether an int8 variant of the fused DiT block kernel
(kernels/dit_block.py) is worth building: measures a VMEM-resident
quantize -> int8 MXU dot -> f32 dequant -> gelu -> quantize -> int8 dot
pipeline against the equivalent bf16 pipeline, at the fused block's
per-grid-cell shapes (S=4 samples x T=256 tokens = 1024 rows, d=1024,
hidden=4096), CHAIN times per call.
Run: JAX_PLATFORMS=axon python tools/microbench_int8_pallas.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 1024
D = 1024
H = 4096
GRID = 16  # grid cells, like bs64 / S=4
CHAIN = 8
REPS = 5


def _quant_rows(xf):
    m = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(m, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _kernel_int8(x_ref, w1_ref, s1_ref, w2_ref, s2_ref, o_ref):
    xf = x_ref[...].astype(jnp.float32)
    for _ in range(CHAIN):
        q, s = _quant_rows(xf)
        h = jax.lax.dot_general(q, w1_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        hf = h.astype(jnp.float32) * s * s1_ref[...]
        hf = jax.nn.gelu(hf, approximate=True)
        q2, s_2 = _quant_rows(hf)
        o = jax.lax.dot_general(q2, w2_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        xf = o.astype(jnp.float32) * s_2 * s2_ref[...]
    o_ref[...] = xf.astype(jnp.bfloat16)


def _kernel_bf16(x_ref, w1_ref, w2_ref, o_ref):
    xf = x_ref[...].astype(jnp.float32)
    for _ in range(CHAIN):
        h = jax.lax.dot_general(xf.astype(jnp.bfloat16), w1_ref[...],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h, approximate=True)
        o = jax.lax.dot_general(h.astype(jnp.bfloat16), w2_ref[...],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        xf = o
    o_ref[...] = xf.astype(jnp.bfloat16)


def time_call(fn, *args):
    jitted = jax.jit(fn)
    float(jnp.float32(jitted(*args).sum()))
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(jnp.float32(jitted(*args).sum()))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    row = pl.BlockSpec((ROWS, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    x = jax.random.normal(jax.random.PRNGKey(0), (GRID * ROWS, D),
                          jnp.bfloat16)
    w1 = jax.random.randint(jax.random.PRNGKey(1), (D, H), -127, 127,
                            jnp.int8)
    w2 = jax.random.randint(jax.random.PRNGKey(2), (H, D), -127, 127,
                            jnp.int8)
    s1 = jnp.full((1, H), 1e-4, jnp.float32)
    s2 = jnp.full((1, D), 1e-4, jnp.float32)
    w1b = (w1.astype(jnp.float32) * 1e-4).astype(jnp.bfloat16)
    w2b = (w2.astype(jnp.float32) * 1e-4).astype(jnp.bfloat16)

    ops = CHAIN * GRID * 2 * (2 * ROWS * D * H)

    def run_int8(x, w1, s1, w2, s2):
        return pl.pallas_call(
            _kernel_int8, grid=(GRID,),
            in_specs=[row, const((D, H)), const((1, H)), const((H, D)),
                      const((1, D))],
            out_specs=row,
            out_shape=jax.ShapeDtypeStruct((GRID * ROWS, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(x, w1, s1, w2, s2)

    def run_bf16(x, w1, w2):
        return pl.pallas_call(
            _kernel_bf16, grid=(GRID,),
            in_specs=[row, const((D, H)), const((H, D))],
            out_specs=row,
            out_shape=jax.ShapeDtypeStruct((GRID * ROWS, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(x, w1, w2)

    tb = time_call(run_bf16, x, w1b, w2b)
    print(f"pallas bf16   : {tb*1e3:8.2f} ms  {ops/tb/1e12:7.1f} TFLOP/s")
    ti = time_call(run_int8, x, w1, s1, w2, s2)
    print(f"pallas int8+dq: {ti*1e3:8.2f} ms  {ops/ti/1e12:7.1f} TOP/s")
    print(f"speedup: {tb/ti:.2f}x")


if __name__ == "__main__":
    main()
