"""Shared sample-statistics evidence harness.

`eval_noise_evidence.py` (solver-tolerance deviation) and
`int8_evidence.py` (w8a8 weight quantization) must stay PROTOCOL-IDENTICAL
— their published numbers are compared against each other (docs/DESIGN.md
"eval_noise evidence" / "int8: where it pays", dit_int8.py "same protocol
as the eval_noise deviation"). This module is that protocol, factored once:

  * the calibrated perturbed-weight DiT-L/2 field (PRNGKey(0) init,
    PRNGKey(42) perturbation, sigma=0.03 — the bench stage_dopri5
    calibration giving |v|rms ~= 1.0),
  * the same VAE decode + [0,1] clip + FID-InceptionV3 pool3 featurizer
    (random-init weights; the real pt_inception download is
    network-blocked — converter bit-parity is tested separately),
  * noise batches keyed PRNGKey(1000 + i), batch 16,
  * eps-regularized (1e-6) activation statistics.

Everything runs as jitted programs with params as jit ARGUMENTS (the
remote axon compiler rejects closure-baked HLO) and syncs via the
activation transfer (block_until_ready does not wait on this platform).

Mirrors the reference FID evidence path: sampling test_flow_latent.py:42-76,
statistics pytorch_fid/fid_score.py:114-174.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

SIGMA = 0.03  # bench stage_dopri5 calibration: |v|rms ~= 1.0
BS = 16


def build(dtype):
    """The evidence field's model pair half: DiT-L/2 at 32x32x4 latents."""
    from lfm_tpu.nn.dit import create_dit
    from lfm_tpu.vae.autoencoder_kl import AutoencoderKL

    model = create_dit("DiT-L/2", img_resolution=32, num_classes=1,
                       dtype=dtype, use_flash=False)
    vae = AutoencoderKL(dtype=jnp.bfloat16)
    return model, vae


def init_calibrated(model_bf, vae, inc, extra=None, tag="evidence"):
    """Perturbed-weight init + VAE + inception params as ONE jitted program
    (eager per-tensor ops through the axon tunnel cost ~1 s each).
    ``extra(params) -> pytree`` optionally derives an extra tree (e.g. the
    int8-quantized params) inside the same program."""

    def init_all():
        p = model_bf.init(jax.random.PRNGKey(0), jnp.zeros((1,)),
                          jnp.zeros((1, 32, 32, 4)), None)
        leaves, treedef = jax.tree_util.tree_flatten(p)
        keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
        leaves = [l + SIGMA * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)]
        p = jax.tree_util.tree_unflatten(treedef, leaves)
        vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)),
                      jax.random.PRNGKey(2))
        ip = inc.init(jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 3)))
        if extra is not None:
            return p, vp, ip, extra(p)
        return p, vp, ip

    t0 = time.time()
    out = jax.jit(init_all)()
    print(f"[{tag}] init {time.time() - t0:.0f}s", file=sys.stderr)
    return out


def make_sampler(apply_fn, vae, inc, method, **kw):
    """jitted run(noise, params, vae_params, inc_params) -> (pool3, nfe):
    integrate the velocity field, VAE-decode, featurize."""
    from lfm_tpu.ode import odeint
    from lfm_tpu.vae.autoencoder_kl import AutoencoderKL

    def run(noise, p, vp, ip):
        def velocity(t, x):
            tb = jnp.broadcast_to(jnp.asarray(t, jnp.float32),
                                  (x.shape[0],))
            return apply_fn(p, tb, x)

        res = odeint(velocity, noise, 1.0, 0.0, method=method, **kw)
        img = vae.apply(vp, res.y / 0.18215, method=AutoencoderKL.decode)
        img = jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)
        return inc.apply(ip, img), res.nfe

    return jax.jit(run)


def collect(fn, n, p, vp, ip, tag="evidence", name=""):
    """n samples in BS-sized batches -> (activations [n,2048], per-batch
    NFE list). NFE is reported per batch — adaptive solvers may step
    differently per noise batch, so a single scalar would describe only
    the last batch."""
    rows, nfes, t0 = [], [], time.time()
    for i in range(0, n, BS):
        noise = jax.random.normal(jax.random.PRNGKey(1000 + i),
                                  (BS, 32, 32, 4))
        a, nfe = fn(noise, p, vp, ip)
        rows.append(np.asarray(a))  # transfer == sync
        nfes.append(float(nfe))
    print(f"[{tag}] {name}: {time.time() - t0:.0f}s "
          f"NFE mean={np.mean(nfes):.1f} "
          f"range=[{min(nfes):.0f},{max(nfes):.0f}]", file=sys.stderr)
    return np.concatenate(rows)[:n], nfes


def stats(a):
    """eps-regularized activation statistics (16..256-sample 2048-dim
    covariances are rank-deficient; the eps keeps scipy's sqrtm off its
    singular-matrix path — same policy as the dryrun's Fréchet check)."""
    mu = a.mean(axis=0)
    s = np.cov(a, rowvar=False) + 1e-6 * np.eye(a.shape[1])
    return mu, s


def relrms(a, b):
    return float(np.sqrt(((a - b) ** 2).mean())
                 / (np.sqrt((b ** 2).mean()) + 1e-20))


def nfe_summary(nfes):
    return {"mean": round(float(np.mean(nfes)), 1),
            "min": round(min(nfes)), "max": round(max(nfes))}
