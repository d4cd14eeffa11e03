"""Single-host sampling pipeline: noise -> ODE integrate -> VAE decode.

Rebuilds the reference's ``run_sampling`` closure (reference
test_flow_latent.py:161-194) as one jitted XLA program: latent noise (counter
-based per-sample RNG), optional CFG (evaluated as a fused 2N batch, see
ode/cfg.py), adaptive or Karras fixed-step integration, latent unscale, VAE
decode, and [0,1] clamp — zero host round-trips per batch.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from lfm_tpu.core.config import Config
from lfm_tpu.core.rng import SampleRNG
from lfm_tpu.ode import karras_sample, odeint
from lfm_tpu.ode.cfg import cfg_velocity, plain_velocity

ADAPTIVE_SOLVER = ("dopri5", "dopri8", "adaptive_heun", "bosh3")
FIXED_SOLVER = ("euler", "rk4", "midpoint", "heun")


class SampleOutput(NamedTuple):
    images: jnp.ndarray  # (N, H, W, 3) in [0, 1]
    latents: jnp.ndarray
    nfe: jnp.ndarray


def build_velocity(model, params, y: Optional[jnp.ndarray], cfg_scale: float,
                   num_classes: Optional[int], *, use_fused_dit: bool = False,
                   use_int8_dit: bool = False, params_pre: Optional[str] = None,
                   shard_mesh=None, sp_mesh=None, pp_mesh=None,
                   pp_chunks: int = 1):
    """v(t, x) closure, CFG-fused when cfg_scale > 1 (test_flow_latent.py:55-59).

    With ``use_fused_dit``, eligible DiT models evaluate through the fused
    Pallas block kernel (nn/dit_fused.py) with a one-time bf16 param cast
    hoisted out of the ODE loop; measured +7.5% end-to-end over the module
    path on v5e at the north-star shape.

    ``shard_mesh`` (multi-device sampling, sample/sharded.py) wraps the
    model evaluation in a ``shard_map`` over the data axis: every operand
    (t, x, y) is batch-sharded, params ride in as replicated captures, and
    the per-shard computation is single-device by construction — which is
    exactly what a pallas_call needs under SPMD. Off-TPU the per-shard body
    falls back to ``model.apply``, so the CPU-mesh suite exercises the
    wrapper end-to-end (mesh-shape invariance of generated samples)."""
    assert pp_mesh is None or sp_mesh is None, (
        "combined sp x pp evaluation is not supported; pick one of "
        "sp_mesh/pp_mesh (dp composes with either)")
    if pp_mesh is not None:
        # Pipeline parallelism (core/pipeline.py): the DiT block stack is
        # staged over the `pipe` mesh axis, microbatches hop stages on ICI.
        # Param TREE is unchanged; placement per sample/pp.py shardings.
        # pp_chunks > 1 selects the interleaved virtual-stage schedule
        # (bubble /= pp_chunks); the caller (make_sampler) pre-permutes the
        # block params into placement order ONCE at build time
        from lfm_tpu.sample.pp import make_pp_apply

        pp_labeled = make_pp_apply(model, pp_mesh, num_chunks=pp_chunks)
        pp_unlabeled = make_pp_apply(model, pp_mesh, has_labels=False,
                                     num_chunks=pp_chunks)

        def apply(t, x, yy):
            if yy is None:
                return pp_unlabeled(params, t, x)
            return pp_labeled(params, t, x, yy)
    elif sp_mesh is not None:
        # Sequence parallelism: batch over `data`, latent rows over `seq`.
        # Two mechanisms by family: DiT runs the explicit ppermute ring
        # (core/ring.py) inside shard_map; conv UNets (ADM/EDM) run under
        # GSPMD spatial partitioning — XLA inserts conv halo exchanges and
        # norm/attention collectives (sample/sp.py::make_spatial_sp_apply).
        # Either way the fused/Pallas single-device paths do not apply.
        from lfm_tpu.core.sharding import SEQ_AXIS
        from lfm_tpu.nn.dit import DiT
        from lfm_tpu.sample.sp import make_sp_apply, make_spatial_sp_apply

        if isinstance(model, DiT):
            model_sp = model.copy(sp_axis=SEQ_AXIS)
            sp_labeled = make_sp_apply(model_sp, sp_mesh)
            sp_unlabeled = make_sp_apply(model_sp, sp_mesh, has_labels=False)
        else:
            sp_labeled = make_spatial_sp_apply(model, sp_mesh)
            sp_unlabeled = make_spatial_sp_apply(model, sp_mesh,
                                                 has_labels=False)

        def apply(t, x, yy):
            if yy is None:
                return sp_unlabeled(params, t, x)
            return sp_labeled(params, t, x, yy)
    elif use_fused_dit or use_int8_dit or shard_mesh is not None:
        from lfm_tpu.nn.dit_fused import (cast_params_bf16, dit_fused_apply,
                                          fused_applicable)
        from lfm_tpu.nn.dit_int8 import (dit_int8_apply, int8_applicable,
                                         quantize_params_int8)
        bf16_params = None  # cast lazily, only if a call is actually fused
        int8_params = None  # quantized lazily, only if int8 engages

        def local_apply(t, x, yy):
            nonlocal bf16_params, int8_params
            if use_int8_dit and int8_applicable(model, x):
                # opt-in w8a8 fast path (nn/dit_int8.py): pure XLA, so it
                # composes with shard_map shards; wins over fused when
                # explicitly requested. make_sampler pre-quantizes the tree
                # ONCE and passes it through jit as an argument
                # (params_pre == "int8"); the lazy path remains for direct
                # build_velocity callers holding an f32 tree.
                if params_pre == "int8":
                    return dit_int8_apply(model, params, t, x, yy)
                if int8_params is None:
                    int8_params = quantize_params_int8(model, params)
                return dit_int8_apply(model, int8_params, t, x, yy)
            if use_fused_dit and fused_applicable(
                    model, x, assume_local=shard_mesh is not None):
                if bf16_params is None:
                    bf16_params = cast_params_bf16(params)
                return dit_fused_apply(model, bf16_params, t, x, yy)
            if shard_mesh is not None:
                # per-shard body is single-device: let flash-attention's
                # Pallas dispatch engage (kernels/flash_attention.py)
                from lfm_tpu.kernels.flash_attention import assume_local_devices
                with assume_local_devices():
                    return model.apply(params, t, x, yy)
            return model.apply(params, t, x, yy)

        if shard_mesh is None:
            apply = local_apply
        else:
            from jax.sharding import PartitionSpec as P

            from lfm_tpu.core.sharding import DATA_AXIS

            shard_map = jax.shard_map
            spec = P(DATA_AXIS)

            def apply(t, x, yy):
                if yy is None:
                    fn = shard_map(
                        lambda t_, x_: local_apply(t_, x_, None),
                        mesh=shard_mesh, in_specs=(spec, spec),
                        out_specs=spec, check_vma=False)
                    return fn(t, x)
                fn = shard_map(local_apply, mesh=shard_mesh,
                               in_specs=(spec, spec, spec), out_specs=spec,
                               check_vma=False)
                return fn(t, x, yy)
    else:
        def apply(t, x, yy):
            return model.apply(params, t, x, yy)

    if y is not None and cfg_scale > 1.0:
        # Each model family defines its own CFG null label:
        #   DiT        -> dedicated null-class row (test_flow_latent.py:176-179)
        #   EDM        -> -1: one_hot(-1) == zero vector == drop_half_label
        #                 zeroing (EDM.py:825-826)
        #   origin ADM -> 0: label_emb is an integer GATHER (unet.py:630), so
        #                 -1 would wrap to the last class; the reference
        #                 harness uses zeros_like(y) (test_flow_latent.py:180)
        null_label = getattr(model, "null_label", -1)
        y_null = jnp.full_like(y, null_label)
        return cfg_velocity(apply, y, y_null, cfg_scale)
    return plain_velocity(apply, y)


def sample_latents(
    velocity: Callable,
    x_noise: jnp.ndarray,
    *,
    method: str = "dopri5",
    atol: float = 1e-5,
    rtol: float = 1e-5,
    num_steps: int = 40,
    step_size: float = 0.01,
    use_karras: bool = False,
    eval_noise=0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Integrate t: 1 -> 0. Returns (z_0, nfe). ``eval_noise`` noise-floors
    the adaptive error estimate ("auto" for bf16 models; ode/solvers.py)."""
    if use_karras:
        z = karras_sample(
            lambda x, sigma: velocity(sigma, x), x_noise, num_steps,
            sampler=method if method in ("euler", "heun") else "euler",
        )
        pairs = max(num_steps - 1, 0)
        if method == "heun":
            # 2nd-order correction only for the first 39 steps (the
            # reference guard `i < steps-1` with the default steps=40;
            # see ode/solvers.py::sample_heun_karras)
            corrected = min(pairs, 39)
            nfe = 2 * corrected + (pairs - corrected)
        else:
            nfe = pairs
        return z, jnp.asarray(float(nfe), jnp.float32)
    if method in ADAPTIVE_SOLVER:
        res = odeint(velocity, x_noise, 1.0, 0.0, method=method, atol=atol,
                     rtol=rtol, eval_noise=eval_noise)
        return res.y, res.nfe
    res = odeint(velocity, x_noise, 1.0, 0.0, method=method,
                 num_steps=num_steps, step_size=step_size)
    return res.y, res.nfe


def resolve_eval_noise(sc, model):
    """Noise-floor policy for the adaptive error estimate.

    Default (``sc.eval_noise is None``): "auto" only where it is needed —
    a bf16 model under dopri8, whose 7th-order embedded estimate sits at
    the bf16 rounding floor and thrashes without it (measured NFE 4070 ->
    422, ode/solvers.py). dopri5 — the method every released argfile uses —
    keeps exact torchdiffeq step control (measured NFE ~206 at bf16, in the
    reference's own range), preserving NFE/FID parity. Set
    ``SampleConfig.eval_noise`` to a float or "auto" to override."""
    if sc.eval_noise is not None:
        return sc.eval_noise
    bf16 = getattr(model, "dtype", jnp.float32) == jnp.bfloat16
    return "auto" if (bf16 and sc.method == "dopri8") else 0.0


def make_sampler(
    config: Config,
    model,
    params,
    vae=None,
    vae_params=None,
    *,
    jit: bool = True,
    sp_mesh=None,
    pp_mesh=None,
) -> Callable:
    """Returns sample_fn(noise, y) -> SampleOutput. Decode is skipped when no
    VAE is provided (latents returned as 'images' for latent-space tests).

    Params flow through the jit boundary as ARGUMENTS, never closure
    constants — closed-over weights would be inlined into the HLO
    (hundreds of MB for DiT-L/2) and blow up compile time/program size.

    ``sp_mesh``: a mesh with a >1 ``seq`` axis runs the velocity net
    sequence-parallel (rows over seq, batch over data; core/ring.py).
    ``pp_mesh``: a mesh with a >1 ``pipe`` axis runs the DiT block stack
    pipeline-parallel (stages over pipe, batch over data; core/pipeline.py).
    """
    sc = config.sample
    num_classes = config.model.num_classes
    eval_noise = resolve_eval_noise(sc, model)

    params_pre = None
    if sc.use_int8_dit and sp_mesh is None and pp_mesh is None:
        from lfm_tpu.nn.dit_int8 import int8_model_ok, quantize_params_int8

        if int8_model_ok(model):
            # Quantize ONCE at sampler build time and pass the int8 tree
            # through jit as an argument — quantizing inside the traced
            # velocity would re-run per ODE step unless XLA hoists it, and
            # would keep the f32 tree live next to the int8 copy.
            params = quantize_params_int8(model, params)
            params_pre = "int8"

    pp_chunks = 1
    if pp_mesh is not None and getattr(config.mesh, "pp_chunks", 1) > 1:
        # interleaved pipeline schedule: permute the block params from the
        # canonical checkpoint order into placement order ONCE here, outside
        # jit (the checkpoint on disk stays canonical)
        from lfm_tpu.core.sharding import PIPE_AXIS
        from lfm_tpu.sample.pp import permute_state_blocks

        pp_chunks = int(config.mesh.pp_chunks)
        params = permute_state_blocks(
            params, pp_mesh.shape[PIPE_AXIS], pp_chunks)

    def raw(params, vae_params, noise: jnp.ndarray, y) -> SampleOutput:
        velocity = build_velocity(model, params, y, sc.cfg_scale, num_classes,
                                  use_fused_dit=sc.use_fused_dit,
                                  use_int8_dit=sc.use_int8_dit,
                                  params_pre=params_pre,
                                  sp_mesh=sp_mesh, pp_mesh=pp_mesh,
                                  pp_chunks=pp_chunks)
        z0, nfe = sample_latents(
            velocity, noise,
            method=sc.method, atol=sc.atol, rtol=sc.rtol,
            num_steps=sc.num_steps, step_size=sc.step_size,
            use_karras=sc.use_karras_samplers,
            eval_noise=eval_noise,
        )
        if vae is None:
            return SampleOutput(images=z0, latents=z0, nfe=nfe)
        img = vae.apply(vae_params, z0 / config.scale_factor, method=type(vae).decode)
        img = jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)  # test_flow_latent.py:128,266
        return SampleOutput(images=img, latents=z0, nfe=nfe)

    jitted = jax.jit(raw) if jit else raw

    def fn(noise: jnp.ndarray, y: Optional[jnp.ndarray] = None) -> SampleOutput:
        return jitted(params, vae_params, noise, y)

    return fn


def noise_and_labels(config: Config, rng: SampleRNG, indices) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Per-sample-index latent noise + labels (test_flow_latent.py:162-169)."""
    s = config.model.latent_size
    noise = rng.randn(indices, (s, s, config.model.num_in_channels))
    y = None
    nc = config.model.num_classes
    if nc is not None and nc > 1:
        y = rng.randint(indices, 0, nc)
    return noise, y
