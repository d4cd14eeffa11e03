"""Sample-statistics evidence for the ``eval_noise="auto"`` deviation.

The adaptive solvers deliberately deviate from torchdiffeq numerics on bf16
velocity nets: the error-ratio noise floor (ode/solvers.py module docstring)
keeps the controller acting on the truncation component instead of bf16
evaluation noise. Round-4 evidence was relRMS-level only (7.8e-3 vs the f32
ground truth); the whole point of controller parity is FID transferability,
so this script upgrades the evidence to SAMPLE-STATISTICS level (VERDICT r4
weak #6 / next-round #5), mirroring what the reference's FID harness would
see (test_flow_latent.py:42-76 sampling + pytorch_fid/fid_score.py stats):

  A: dopri5, eval_noise="auto"  (the deviation, production default for bf16)
  B: dopri5, eval_noise=0.0     (exact torchdiffeq semantics, bf16 net)
  C: rk4 fixed-step 50 (NFE 200), f32 net — high-order ground truth
     (global error O(h^4) ~ 1.6e-7, far below the bf16 noise floor)

over N samples of the bench's calibrated perturbed-weight DiT-L/2 field,
each decoded by the same VAE and featurized by the same (random-init,
network-blocked weights) FID InceptionV3. Reported: Fréchet distances
FID(A,C), FID(B,C), FID(A,B) on eps-regularized stats + per-variant NFE.
If FID(A,B) is negligible against FID(*,C), the flooring does not move the
sample statistics and the deviation is FID-safe.

Run on the TPU chip: ``python tools/eval_noise_evidence.py [N]``.
Results are recorded in docs/DESIGN.md ("eval_noise evidence").
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
        return p, vp, ip

    t0 = time.time()
    params, vae_params, inc_params = jax.jit(init_all)()
    print(f"[evidence] init {time.time() - t0:.0f}s", file=sys.stderr)

    def make_fn(model, method, **kw):
        def run(noise, p, vp, ip):
            def velocity(t, x):
                tb = jnp.broadcast_to(jnp.asarray(t, jnp.float32),
                                      (x.shape[0],))
                return model.apply(p, tb, x)

            res = odeint(velocity, noise, 1.0, 0.0, method=method, **kw)
            img = vae.apply(vp, res.y / 0.18215,
                            method=AutoencoderKL.decode)
            img = jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)
            return inc.apply(ip, img), res.nfe

        return jax.jit(run)

    variants = {
        "auto": make_fn(model_bf, "dopri5", atol=1e-5, rtol=1e-5,
                        max_steps=300, eval_noise="auto"),
        "zero": make_fn(model_bf, "dopri5", atol=1e-5, rtol=1e-5,
                        max_steps=300, eval_noise=0.0),
        "gt_rk4_f32": make_fn(model_f32, "rk4", num_steps=50),
    }

    acts, nfes = {}, {}
    for name, fn in variants.items():
        rows, t0 = [], time.time()
        for i in range(0, n, bs):
            noise = jax.random.normal(jax.random.PRNGKey(1000 + i),
                                      (bs, 32, 32, 4))
            a, nfe = fn(noise, params, vae_params, inc_params)
            rows.append(np.asarray(a))  # transfer == sync
            nfes[name] = float(nfe)
        acts[name] = np.concatenate(rows)[:n]
        print(f"[evidence] {name}: {time.time() - t0:.0f}s "
              f"NFE={nfes[name]:.0f}", file=sys.stderr)

    def stats(a):
        mu = a.mean(axis=0)
        s = np.cov(a, rowvar=False) + 1e-6 * np.eye(a.shape[1])
        return mu, s

    from lfm_tpu.eval.fid import calculate_frechet_distance

    st = {k: stats(v) for k, v in acts.items()}
    out = {
        "n": n,
        "nfe": {k: round(v) for k, v in nfes.items()},
        "relrms_auto_vs_gt": float(
            np.sqrt(((acts["auto"] - acts["gt_rk4_f32"]) ** 2).mean())
            / (np.sqrt((acts["gt_rk4_f32"] ** 2).mean()) + 1e-20)),
        "fid_auto_vs_gt": calculate_frechet_distance(
            *st["auto"], *st["gt_rk4_f32"]),
        "fid_zero_vs_gt": calculate_frechet_distance(
            *st["zero"], *st["gt_rk4_f32"]),
        "fid_auto_vs_zero": calculate_frechet_distance(
            *st["auto"], *st["zero"]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
