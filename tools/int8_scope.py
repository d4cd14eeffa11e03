"""Scope the int8 (w8a8) DiT path: find the regime where it pays.

Round-3 verdict (nn/dit_int8.py docstring): at the compute-bound north-star
batch, int8 LOSES on v5e — XLA's int8 dot sustains only the bf16 peak
(194.9 TOP/s, not the datasheet 2x), so the quant epilogues are pure
overhead. The remaining hypothesis (VERDICT r4 weak #7) is the MEMORY-BOUND
regime: at batch<=4 each NFE streams the full weight tree from HBM
(DiT-L/2 bf16 ~0.92 GB -> ~1.1 ms at the v5e's ~819 GB/s, vs ~0.8 ms of MXU
work at batch 1), and int8 halves the bytes of the four quantized block
matmuls (302M of the 458M params).

This script A/Bs the exact stage-int8 workload (euler NFE=100 + VAE decode,
reference test_flow_latent.py:161-194) at small batches in ONE process:

    python tools/int8_scope.py [batches...]   (default: 1 2 4)

Prints one JSON line per (batch, path) and a final verdict line; numbers
land in docs/DESIGN.md "int8 scope" and tools/bench_cache.json. AOT entries
are NOT saved (one-off lowerings would bloat the committed cache).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (shares the FLOPs constants + workload helpers)

NFE = bench.NFE
WARMUP = 1
REPS = int(os.environ.get("SCOPE_REPS", "5"))


def _time(jitted, batch, *args):
    import jax
    import jax.numpy as jnp

    for _ in range(WARMUP):
        buf = jax.random.normal(jax.random.PRNGKey(3), (batch, 32, 32, 4))
        float(jitted(buf, *args))
    times = []
    for _ in range(REPS):
        buf = jax.random.normal(jax.random.PRNGKey(3), (batch, 32, 32, 4))
        float(jnp.float32(buf[0, 0, 0, 0]))
        t0 = time.perf_counter()
        float(jitted(buf, *args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main(argv):
    import jax.numpy as jnp

    from tools.aot import jit_cached
    from lfm_tpu.nn.dit_int8 import dit_int8_apply, quantize_params_int8

    batches = [int(a) for a in argv] or [1, 2, 4]
    model, params, vae, vae_params = bench._dit_and_vae(use_flash=False)
    qp = jit_cached("int8_quant",
                    lambda p: quantize_params_int8(model, p), (params,)
                    )(params)

    results = {}
    for batch in batches:
        row = {}
        for path, apply_fn, p in (
                ("bf16", model.apply, params),
                ("int8", lambda pp, tb, x: dit_int8_apply(model, pp, tb, x),
                 qp)):
            sample = bench._sample_loop(apply_fn, vae, batch, 32, NFE)
            jitted = jit_cached(
                f"scope_{path}_bs{batch}", sample,
                (jnp.zeros((batch, 32, 32, 4)), p, vae_params),
                donate_argnums=(0,), save=False)
            best = _time(jitted, batch, p, vae_params)
            row[path] = {"samples_per_sec": round(batch / best, 4),
                         "ms_per_nfe": round(best / NFE * 1e3, 3)}
            print(json.dumps({"batch": batch, "path": path, **row[path]}),
                  flush=True)
        row["int8_speedup"] = round(row["int8"]["samples_per_sec"]
                                    / row["bf16"]["samples_per_sec"], 3)
        results[str(batch)] = row
    print(json.dumps({"verdict": results}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
