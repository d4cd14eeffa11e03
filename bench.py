"""Benchmark: CelebA-HQ 256 sampling throughput, samples/sec/chip (+ MFU,
training steps/sec).

Measures the BASELINE.json north-star workload — DiT-L/2 velocity sampling in
f8 latent space (32x32x4) for 256px images, the exact per-NFE kernel of the
reference's FID generation path (reference test_flow_latent.py:161-194,
models/DiT.py:252-272) — on one TPU chip, bf16 compute.

The integrator runs 100 euler steps per sample: a fixed-NFE proxy for the
dopri5 adaptive run, whose NFE the reference instruments at ~O(100)
(test_flow_latent.py:196-221); a randomly-initialised DiT has near-zero
velocity (adaLN-zero init), so adaptive step control on random weights would
finish in a handful of steps and overstate throughput. VAE decode is included
(it is part of the reference's measured `run_sampling`). The adaptive path
itself adds no overhead: real dopri5 on a perturbed DiT-L/2 measured the
same per-NFE throughput as this euler proxy (NFE 218 -> 3.49 samples/s), so
samples/sec scales as 100/NFE of the trained checkpoint.

vs_baseline: ratio against the reference implementation's ESTIMATED A100
throughput for the same workload, 0.5 samples/sec/GPU — derived from
torchdiffeq dopri5 at NFE~100 with ~20 ms/NFE for batched DiT-L/2 eager
PyTorch on A100 (the reference's own `--measure_time` harness shape,
test_flow_latent.py:223-246). The estimate is self-derived, not a
measurement; the defensible absolute numbers are `value` and the MFU.

Extras (recorded in the same JSON line, `extra` key):
  * sample_mfu      — XLA cost-analysis FLOPs of the jitted sampling program
                      divided by wall time and the v5e bf16 peak (197 TFLOP/s)
  * train_steps_per_sec / train_samples_per_sec / train_mfu —
    sustained fused jitted train steps (DiT-L/2, latent data, batch 32,
    remat(dots), bf16, AdamW + EMA; reference instruments steps/sec at
    train_flow_latent.py:158-170). train_mfu uses the model-FLOPs
    convention (3x forward; remat recompute and optimizer excluded).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import time

import jax
import jax.numpy as jnp

A100_BASELINE_SAMPLES_PER_SEC = 0.5  # documented estimate, see module docstring
V5E_BF16_PEAK_FLOPS = 197e12
NFE = 100
BATCH = 64
TRAIN_BATCH = 32
TRAIN_CHAIN = 8
WARMUP = 1
REPS = 3

# Exact per-sample forward FLOPs from XLA cost_analysis of LOOP-FREE
# compilations (cost analysis counts lax.scan/while bodies ONCE, so the
# full looped sampling program cannot be queried directly). Measured on
# this chip via jit(model.apply).lower(...).compile().cost_analysis()
# with scan_blocks=False:
#   DiT-L/2 @ 32x32x4 latents (256 tokens, d=1024, depth 24): 1.61932e11
#   (analytic closed form 24*(24*T*d^2 + 4*T^2*d) + embedders agrees <1%)
#   SD-VAE decoder 32x32x4 -> 256x256x3:                      6.15809e11
DIT_L2_FWD_FLOPS_PER_SAMPLE = 1.61932e11
VAE_DECODE_FLOPS_PER_SAMPLE = 6.15809e11


def _time_best(fn, *args) -> float:
    for _ in range(WARMUP):
        float(fn(*args))
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(fn(*args))  # scalar transfer == sync (axon block_until_ready no-op)
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_sampling():
    from lfm_tpu.nn.dit import create_dit
    from lfm_tpu.nn.dit_fused import cast_params_bf16, dit_fused_apply
    from lfm_tpu.ode import odeint
    from lfm_tpu.vae.autoencoder_kl import AutoencoderKL

    model = create_dit("DiT-L/2", img_resolution=32, num_classes=1,
                       dtype=jnp.bfloat16, use_flash=True)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1,)), jnp.zeros((1, 32, 32, 4)), None
    )
    vae = AutoencoderKL(dtype=jnp.bfloat16)
    vae_params = vae.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(2)
    )

    def sample(params, vae_params, noise):
        # fused Pallas DiT block path, bf16 cast hoisted out of the loop —
        # same path make_sampler takes on TPU (sample/sample.py)
        bf = cast_params_bf16(params)

        def velocity(t, x):
            tb = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (x.shape[0],))
            return dit_fused_apply(model, bf, tb, x)

        res = odeint(velocity, noise, 1.0, 0.0, method="euler", num_steps=NFE)
        img = vae.apply(vae_params, res.y / 0.18215, method=AutoencoderKL.decode)
        img = jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)
        # scalar checksum: forces full execution with a tiny host transfer
        return jnp.float32(img.sum())

    jitted = jax.jit(sample, donate_argnums=(2,))

    # fresh donated noise buffer per call
    for _ in range(WARMUP):
        buf = jax.random.normal(jax.random.PRNGKey(3), (BATCH, 32, 32, 4))
        float(jitted(params, vae_params, buf))
    times = []
    for _ in range(REPS):
        buf = jax.random.normal(jax.random.PRNGKey(3), (BATCH, 32, 32, 4))
        float(jnp.float32(buf[0, 0, 0, 0]))  # materialize before timing
        t0 = time.perf_counter()
        float(jitted(params, vae_params, buf))
        times.append(time.perf_counter() - t0)
    best = min(times)
    sps = BATCH / best
    flops = BATCH * (NFE * DIT_L2_FWD_FLOPS_PER_SAMPLE + VAE_DECODE_FLOPS_PER_SAMPLE)
    mfu = flops / best / V5E_BF16_PEAK_FLOPS
    return sps, mfu, best


def bench_training():
    """Sustained train-step time: FM loss + backward + one-pass fused
    AdamW/EMA on latent data (DiT-L/2, remat(dots), bf16) — reference
    train_flow_latent.py:135-170. Steps are chained with a single scalar
    sync at the end (CHAIN steps per timing), matching how the real loop
    dispatches; a per-step sync would add the ~25 ms tunnel round-trip,
    which is measurement overhead, not device time."""
    from lfm_tpu.core.config import TrainConfig
    from lfm_tpu.nn.dit import create_dit
    from lfm_tpu.train.state import (create_train_state, make_fused_adamw_ema,
                                     make_optimizer)
    from lfm_tpu.train.train import make_train_step

    model = create_dit("DiT-L/2", img_resolution=32, num_classes=1,
                       dtype=jnp.bfloat16, remat=True, remat_policy="dots",
                       use_flash=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,)),
                        jnp.zeros((1, 32, 32, 4)), None)
    cfg = TrainConfig(lr=1e-4, no_lr_decay=True, use_ema=True)
    tx = make_optimizer(cfg, steps_per_epoch=100)
    state = create_train_state(params, cfg, steps_per_epoch=100)

    def model_apply(p, t, z, y, rngs=None):
        return model.apply(p, t, z, y)

    step = make_train_step(
        model_apply, tx, use_ema=True, is_latent_data=True,
        fused_update=make_fused_adamw_ema(cfg, steps_per_epoch=100),
    )
    jstep = jax.jit(step, donate_argnums=(0,))

    batch = {"x": jax.random.normal(jax.random.PRNGKey(4),
                                    (TRAIN_BATCH, 32, 32, 4))}
    key = jax.random.PRNGKey(5)

    # warmup + timing; state is donated so thread it through
    state, m = jstep(state, batch, key)
    _ = float(m.loss)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(TRAIN_CHAIN):
            state, m = jstep(state, batch, key)
        _ = float(m.loss)  # scalar sync once per chain
        times.append((time.perf_counter() - t0) / TRAIN_CHAIN)
    best = min(times)
    # model-FLOPs MFU convention: train = 3x forward (remat recompute and
    # the optimizer/EMA elementwise pass are excluded)
    mfu = 3 * TRAIN_BATCH * DIT_L2_FWD_FLOPS_PER_SAMPLE / best / V5E_BF16_PEAK_FLOPS
    return 1.0 / best, TRAIN_BATCH / best, mfu


def main():
    sps, sample_mfu, _ = bench_sampling()
    train_sps, train_samples, train_mfu = bench_training()
    extra = {
        "sample_mfu": round(sample_mfu, 4),
        "train_steps_per_sec": round(train_sps, 3),
        "train_samples_per_sec": round(train_samples, 2),
        "train_mfu": round(train_mfu, 4),
        "train_config": "DiT-L/2 latent bs32 remat(dots) bf16 AdamW+EMA",
    }
    print(json.dumps({
        "metric": "celeb256_dit_samples_per_sec_per_chip",
        "value": round(sps, 4),
        "unit": "samples/sec (DiT-L/2, 100-NFE euler + VAE decode, bf16, batch 64)",
        "vs_baseline": round(sps / A100_BASELINE_SAMPLES_PER_SEC, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
