"""Sample-statistics evidence for the int8 (w8a8) sampling path.

tools/int8_scope.py found the regime where int8 pays on v5e: the
weight-bandwidth-bound batches (<=16), peaking at 9.97 samples/s at bs16 —
above the 9.13 bf16 headline. Before that number can be cited anywhere, the
quality cost must be quantified the same way the eval_noise deviation was —
via the SHARED evidence protocol (tools/evidence_common.py: calibrated
perturbed-weight DiT-L/2 field, VAE decode, FID-InceptionV3 features):

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
Results land in docs/DESIGN.md ("int8: where it pays").
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax.numpy as jnp

from tools import evidence_common as ev


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from lfm_tpu.eval.fid import calculate_frechet_distance
    from lfm_tpu.eval.inception import FIDInceptionV3
    from lfm_tpu.nn.dit_int8 import dit_int8_apply, quantize_params_int8

    model_bf, vae = ev.build(jnp.bfloat16)
    model_f32, _ = ev.build(jnp.float32)
    inc = FIDInceptionV3()
    params, vae_params, inc_params, qparams = ev.init_calibrated(
        model_bf, vae, inc,
        extra=lambda p: quantize_params_int8(model_bf, p),
        tag="int8-evidence")

    variants = {
        "bf16": (ev.make_sampler(model_bf.apply, vae, inc, "euler",
                                 num_steps=100), params),
        "int8": (ev.make_sampler(
            lambda p, tb, x: dit_int8_apply(model_bf, p, tb, x),
            vae, inc, "euler", num_steps=100), qparams),
        "gt_rk4_f32": (ev.make_sampler(model_f32.apply, vae, inc, "rk4",
                                       num_steps=50), params),
    }

    acts = {}
    for name, (fn, p) in variants.items():
        acts[name], _ = ev.collect(fn, n, p, vae_params, inc_params,
                                   tag="int8-evidence", name=name)

    st = {k: ev.stats(v) for k, v in acts.items()}
    out = {
        "n": n,
        "relrms_int8_vs_bf16": ev.relrms(acts["int8"], acts["bf16"]),
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
