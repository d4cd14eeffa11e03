"""Sample-statistics evidence for the int8 (w8a8) sampling path.

tools/int8_scope.py found the regime where int8 pays on v5e: the
weight-bandwidth-bound batches (<=16), peaking at 9.97 samples/s at bs16 —
above the 9.13 bf16 headline. Before that number can be cited anywhere, the
quality cost must be quantified the same way the eval_noise deviation was
(tools/eval_noise_evidence.py): inception-statistics Fréchet distances over
N samples of the bench's calibrated perturbed-weight DiT-L/2 field:

  A: euler NFE=100, bf16 net           (the production headline path)
  B: euler NFE=100, int8 (w8a8) net    (nn/dit_int8.py, same weights)
  C: rk4 fixed-step 50 (NFE 200), f32 net — ground truth

Unlike eval_noise (a solver-tolerance effect, FID ~3e-12), int8 quantizes
the weights themselves, so B samples a *perturbed model* — FID(B, A) is
expected to be materially nonzero. The decision rule: the headline stays
bf16 unless FID(B, A) is negligible against FID(A, C); either way the
measured distance scopes where the 9.97 samples/s may be used (throughput-
critical serving that tolerates a quantified stats shift).

Run on the TPU chip: ``python tools/int8_evidence.py [N]``.
Results land in docs/DESIGN.md ("int8 scope").
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def build(dtype):
    from lfm_tpu.nn.dit import create_dit
    from lfm_tpu.vae.autoencoder_kl import AutoencoderKL

    model = create_dit("DiT-L/2", img_resolution=32, num_classes=1,
                       dtype=dtype, use_flash=False)
    vae = AutoencoderKL(dtype=jnp.bfloat16)
    return model, vae


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    bs = 16
    sigma = 0.03  # bench stage_dopri5 calibration: |v|rms ~= 1.0
    from lfm_tpu.eval.inception import FIDInceptionV3
    from lfm_tpu.nn.dit_int8 import dit_int8_apply, quantize_params_int8
    from lfm_tpu.ode import odeint
    from lfm_tpu.vae.autoencoder_kl import AutoencoderKL

    model_bf, vae = build(jnp.bfloat16)
    model_f32, _ = build(jnp.float32)
    inc = FIDInceptionV3()

    def init_all():
        p = model_bf.init(jax.random.PRNGKey(0), jnp.zeros((1,)),
                          jnp.zeros((1, 32, 32, 4)), None)
        leaves, treedef = jax.tree_util.tree_flatten(p)
        keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
        leaves = [l + sigma * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)]
        p = jax.tree_util.tree_unflatten(treedef, leaves)
        vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)),
                      jax.random.PRNGKey(2))
        ip = inc.init(jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 3)))
        qp = quantize_params_int8(model_bf, p)
        return p, vp, ip, qp

    t0 = time.time()
    params, vae_params, inc_params, qparams = jax.jit(init_all)()
    print(f"[int8-evidence] init {time.time() - t0:.0f}s", file=sys.stderr)

    def make_fn(apply_fn, method, **kw):
        def run(noise, p, vp, ip):
            def velocity(t, x):
                tb = jnp.broadcast_to(jnp.asarray(t, jnp.float32),
                                      (x.shape[0],))
                return apply_fn(p, tb, x)

            res = odeint(velocity, noise, 1.0, 0.0, method=method, **kw)
            img = vae.apply(vp, res.y / 0.18215,
                            method=AutoencoderKL.decode)
            img = jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)
            return inc.apply(ip, img)

        return jax.jit(run)

    variants = {
        "bf16": (make_fn(model_bf.apply, "euler", num_steps=100), params),
        "int8": (make_fn(
            lambda p, tb, x: dit_int8_apply(model_bf, p, tb, x),
            "euler", num_steps=100), qparams),
        "gt_rk4_f32": (make_fn(model_f32.apply, "rk4", num_steps=50),
                       params),
    }

    acts = {}
    for name, (fn, p) in variants.items():
        rows, t0 = [], time.time()
        for i in range(0, n, bs):
            noise = jax.random.normal(jax.random.PRNGKey(1000 + i),
                                      (bs, 32, 32, 4))
            rows.append(np.asarray(fn(noise, p, vae_params, inc_params)))
        acts[name] = np.concatenate(rows)[:n]
        print(f"[int8-evidence] {name}: {time.time() - t0:.0f}s",
              file=sys.stderr)

    def stats(a):
        mu = a.mean(axis=0)
        s = np.cov(a, rowvar=False) + 1e-6 * np.eye(a.shape[1])
        return mu, s

    from lfm_tpu.eval.fid import calculate_frechet_distance

    st = {k: stats(v) for k, v in acts.items()}
    out = {
        "n": n,
        "relrms_int8_vs_bf16": float(
            np.sqrt(((acts["int8"] - acts["bf16"]) ** 2).mean())
            / (np.sqrt((acts["bf16"] ** 2).mean()) + 1e-20)),
        "fid_bf16_vs_gt": calculate_frechet_distance(
            *st["bf16"], *st["gt_rk4_f32"]),
        "fid_int8_vs_gt": calculate_frechet_distance(
            *st["int8"], *st["gt_rk4_f32"]),
        "fid_int8_vs_bf16": calculate_frechet_distance(
            *st["int8"], *st["bf16"]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
