"""Pipeline bubble vs microbatch count: measured demonstration (VERDICT r3
item 8 — "cut the GPipe bubble ... or demonstrate with numbers that
microbatch scaling already saturates").

The SPMD pipeline (core/pipeline.py) runs M + S - 1 ticks of constant
per-tick work, so the bubble fraction is structurally (S-1)/(M+S-1) and the
per-sample cost model is t(M) = t_work * (1 + (S-1)/M). Raising M is one
lever but shrinks the per-tick microbatch (measured: inverts at M=16 when
it hits one sample per shard). The interleaved schedule
(pipeline_blocks_interleaved, v virtual chunks per device) is the other
lever: t(M, v) = t_work * (1 + (S-1)/(vM)) — the same (S-1)-chunk bubble
amortized over v x more ticks at UNCHANGED microbatch size. This tool
measures both on a pp=4 virtual CPU mesh and fits the shared model.

Run: python tools/pp_bubble_demo.py  (CPU; ~3 min)
"""

import os
import sys
import time

os.environ.pop("JAX_PLATFORMS", None)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def main():
    from lfm_tpu.core.sharding import make_mesh
    from lfm_tpu.nn.dit import DiT
    from lfm_tpu.sample.pp import make_pp_apply

    S = 4
    mesh = make_mesh(dp=2, pp=S)
    depth, b = 8, 32  # global batch 32 => 16 per data shard
    model = DiT(img_resolution=16, patch_size=2, in_channels=4,
                hidden_size=128, depth=depth, num_heads=4, num_classes=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,)),
                        jnp.zeros((1, 16, 16, 4)), None)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(b, 16, 16, 4)).astype(np.float32))
    t = jnp.full((b,), 0.5, jnp.float32)

    rows = []
    for m in (1, 2, 4, 8, 16):
        apply_pp = make_pp_apply(model, mesh, has_labels=False,
                                 num_microbatches=m)
        jf = jax.jit(apply_pp)
        out = jf(params, t, x)
        out.block_until_ready()
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jf(params, t, x)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        rows.append((m, dt))
        print(f"M={m:3d}: {dt * 1e3:8.1f} ms/batch  "
              f"model bubble {(S - 1) / (m + S - 1):.3f}", flush=True)

    # fit t(M) = t_work * (1 + (S-1)/M): regress measured time on (1+(S-1)/M)
    ms = np.array([r[0] for r in rows], np.float64)
    ts = np.array([r[1] for r in rows], np.float64)
    feats = 1.0 + (S - 1) / ms
    t_work = float((feats @ ts) / (feats @ feats))
    pred = t_work * feats
    rel = np.abs(pred - ts) / ts
    print(f"fit t_work={t_work * 1e3:.1f} ms, rel errs "
          f"{np.round(rel, 3).tolist()}")
    speedup = ts[0] / ts[-1]
    print(f"M=1 -> M={int(ms[-1])} speedup {speedup:.2f}x "
          f"(structural limit {feats[0] / feats[-1]:.2f}x)")

    # interleaved: depth 16 so chunks exist up to v=4; fixed M, rising v
    from lfm_tpu.sample.pp import interleave_block_params

    model2 = DiT(img_resolution=16, patch_size=2, in_channels=4,
                 hidden_size=128, depth=16, num_heads=4, num_classes=1)
    params2 = model2.init(jax.random.PRNGKey(0), jnp.zeros((1,)),
                          jnp.zeros((1, 16, 16, 4)), None)
    print("\ninterleaved (depth 16):", flush=True)
    rows2 = []
    for m in (4, 8):
        for v in (1, 2, 4):
            p_il = interleave_block_params(params2, S, v)
            apply_il = make_pp_apply(model2, mesh, has_labels=False,
                                     num_microbatches=m, num_chunks=v)
            jf = jax.jit(apply_il)
            out = jf(p_il, t, x)
            out.block_until_ready()
            reps = 5
            t0 = time.perf_counter()
            for _ in range(reps):
                out = jf(p_il, t, x)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / reps
            rows2.append((m, v, dt))
            print(f"M={m:3d} v={v}: {dt * 1e3:8.1f} ms/batch  "
                  f"model bubble {(S - 1) / (v * m + S - 1):.3f}", flush=True)
    feats2 = np.array([1.0 + (S - 1) / (v * m) for m, v, _ in rows2])
    ts2 = np.array([r[2] for r in rows2], np.float64)
    t_work2 = float((feats2 @ ts2) / (feats2 @ feats2))
    rel2 = np.abs(t_work2 * feats2 - ts2) / ts2
    print(f"fit t_work={t_work2 * 1e3:.1f} ms, rel errs "
          f"{np.round(rel2, 3).tolist()}")
    for m in (4, 8):
        a = next(dt for mm, v, dt in rows2 if mm == m and v == 1)
        b4 = next(dt for mm, v, dt in rows2 if mm == m and v == 4)
        print(f"M={m}: v=1 -> v=4 speedup {a / b4:.2f}x "
              f"(structural {(1 + (S - 1) / m) / (1 + (S - 1) / (4 * m)):.2f}x)")


if __name__ == "__main__":
    main()
