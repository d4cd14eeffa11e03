"""Microbenchmark: int8 vs bf16 matmul throughput at DiT-L/2 shapes.

v5e datasheet: 197 TFLOPS bf16, 394 TOPS int8 — the MXU runs int8 at 2x.
This measures whether XLA (and Pallas) actually reach that rate for the
dense shapes that dominate DiT sampling (rows = batch*tokens = 64*256 =
16384, d=1024, mlp hidden 4096), to decide if a quantized sampling path is
worth building. Run: JAX_PLATFORMS=axon python tools/microbench_int8.py
"""

import time

import jax
import jax.numpy as jnp

ROWS = 16384
D = 1024
H = 4096
CHAIN = 32  # matmuls per timed call; one scalar sync at the end
REPS = 5


def time_chain(fn, *args):
    jitted = jax.jit(fn)
    float(jitted(*args))  # compile + warmup
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(jitted(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_bf16():
    x = jnp.ones((ROWS, D), jnp.bfloat16)
    w1 = jnp.ones((D, H), jnp.bfloat16) * 0.01
    w2 = jnp.ones((H, D), jnp.bfloat16) * 0.01

    def fn(x, w1, w2):
        for _ in range(CHAIN):
            h = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            x = jax.lax.dot_general(h.astype(jnp.bfloat16), w2,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).astype(jnp.bfloat16)
        return jnp.float32(x.sum())

    t = time_chain(fn, x, w1, w2)
    flops = CHAIN * 2 * (2 * ROWS * D * H)
    print(f"bf16   : {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TFLOP/s")
    return flops / t


def bench_int8():
    x = jnp.ones((ROWS, D), jnp.int8)
    w1 = jnp.ones((D, H), jnp.int8)
    w2 = jnp.ones((H, D), jnp.int8)

    def fn(x, w1, w2):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(CHAIN):
            h = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            # requantize to int8 (shift keeps values tiny); mimics the real
            # path's dequant+quant epilogue cost shape
            h8 = (h >> 10).astype(jnp.int8)
            o = jax.lax.dot_general(h8, w2, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            acc = acc + o[0, 0].astype(jnp.float32)
            x = (o >> 10).astype(jnp.int8)
        return acc

    t = time_chain(fn, x, w1, w2)
    ops = CHAIN * 2 * (2 * ROWS * D * H)
    print(f"int8   : {t*1e3:8.2f} ms  {ops/t/1e12:7.1f} TOP/s")
    return ops / t


def bench_int8_dequant():
    """int8 matmul with the full per-row/per-col f32 dequant epilogue."""
    x = jnp.ones((ROWS, D), jnp.int8)
    w1 = jnp.ones((D, H), jnp.int8)
    w2 = jnp.ones((H, D), jnp.int8)
    sx = jnp.full((ROWS, 1), 0.01, jnp.float32)
    s1 = jnp.full((1, H), 0.01, jnp.float32)
    s2 = jnp.full((1, D), 0.01, jnp.float32)

    def quant_rows(a):
        m = jnp.max(jnp.abs(a), axis=-1, keepdims=True)
        s = jnp.maximum(m, 1e-6) / 127.0
        q = jnp.clip(jnp.round(a / s), -127, 127).astype(jnp.int8)
        return q, s

    def fn(x, sx, w1, s1, w2, s2):
        for _ in range(CHAIN):
            h = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            hf = h.astype(jnp.float32) * sx * s1
            hf = jax.nn.gelu(hf, approximate=True)
            x8, sx2 = quant_rows(hf)
            o = jax.lax.dot_general(x8, w2, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            of = o.astype(jnp.float32) * sx2 * s2
            x, sx = quant_rows(of)
        return jnp.float32(x.astype(jnp.float32).sum())

    t = time_chain(fn, x, sx, w1, s1, w2, s2)
    ops = CHAIN * 2 * (2 * ROWS * D * H)
    print(f"int8+dq: {t*1e3:8.2f} ms  {ops/t/1e12:7.1f} TOP/s (effective)")
    return ops / t


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} shapes ({ROWS},{D})x({D},{H})")
    b = bench_bf16()
    i = bench_int8()
    d = bench_int8_dequant()
    print(f"int8/bf16 raw speedup: {i/b:.2f}x   with dequant: {d/b:.2f}x")
