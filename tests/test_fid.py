"""FID stack tests: inception architecture/converter, Fréchet distance."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lfm_tpu.eval.fid import (
    activation_statistics,
    calculate_frechet_distance,
    fid_from_activations,
    load_statistics,
    save_statistics,
)
from lfm_tpu.eval.inception import FIDInceptionV3, convert_inception_state_dict


def test_frechet_distance_identity():
    rng = np.random.default_rng(0)
    acts = rng.normal(size=(500, 16))
    mu, sigma = activation_statistics(acts)
    assert abs(calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_distance_known_value():
    """For isotropic Gaussians: d^2 = |mu1-mu2|^2 + (s1-s2)^2 * dim (diag)."""
    d = 8
    mu1, mu2 = np.zeros(d), np.ones(d) * 2.0
    s1, s2 = np.eye(d) * 1.0, np.eye(d) * 4.0
    got = calculate_frechet_distance(mu1, s1, mu2, s2)
    want = 4.0 * d + d * (1.0 - 2.0) ** 2  # |mu|^2 + tr(C1+C2-2sqrt(C1 C2))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_stats_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    acts = rng.normal(size=(100, 8))
    mu, sigma = activation_statistics(acts)
    p = str(tmp_path / "stat.npy")
    save_statistics(p, mu, sigma)
    mu2, sigma2 = load_statistics(p)
    np.testing.assert_array_equal(mu, mu2)
    np.testing.assert_array_equal(sigma, sigma2)
    assert fid_from_activations(acts, p) < 1e-6


def test_inception_forward_shape():
    model = FIDInceptionV3()
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 2048)
    assert np.isfinite(np.asarray(out)).all()


def test_inception_converter_structure():
    """Build a synthetic state dict with the pytorch-fid names and shapes and
    verify the converted tree matches model.init exactly."""
    model = FIDInceptionV3(include_head=True)
    x = jnp.zeros((1, 299, 299, 3))
    init = model.init(jax.random.PRNGKey(0), x)

    # synthesize a torch-style state dict from the init tree (inverse mapping)
    sd = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                if k == "conv":
                    w = np.asarray(v["kernel"]).transpose(3, 2, 0, 1)
                    sd[f"{prefix}.conv.weight"] = w
                elif k == "fc":
                    sd["fc.weight"] = np.asarray(v["kernel"]).T
                    sd["fc.bias"] = np.asarray(v["bias"])
                else:
                    walk(v, f"{prefix}.{k}" if prefix else k)
            else:
                name = {
                    "bn_scale": "bn.weight", "bn_offset": "bn.bias",
                    "bn_mean": "bn.running_mean", "bn_var": "bn.running_var",
                }[k]
                sd[f"{prefix}.{name}"] = np.asarray(v)

    walk(init["params"], "")
    conv = convert_inception_state_dict(sd)

    flat_init = jax.tree_util.tree_leaves_with_path(init)
    flat_conv = jax.tree_util.tree_leaves_with_path(conv)
    paths_i = {jax.tree_util.keystr(p): l.shape for p, l in flat_init}
    paths_c = {jax.tree_util.keystr(p): np.shape(l) for p, l in flat_conv}
    assert paths_i == paths_c

    out = FIDInceptionV3(include_head=True).apply(conv, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 1008)


def test_inception_batchnorm_semantics():
    """BN must use running stats: constant input -> relu((c-mean)/sqrt(var+eps)*s+o)."""
    from lfm_tpu.eval.inception import BasicConv

    m = BasicConv(4, (1, 1))
    x = jnp.ones((1, 4, 4, 2))
    p = m.init(jax.random.PRNGKey(0), x)
    p = jax.tree_util.tree_map(np.asarray, p)
    p["params"]["bn_mean"] = np.full(4, 0.5, np.float32)
    p["params"]["bn_var"] = np.full(4, 4.0, np.float32)
    p["params"]["bn_scale"] = np.full(4, 2.0, np.float32)
    p["params"]["bn_offset"] = np.full(4, 0.1, np.float32)
    conv_out = np.einsum(
        "c,ck->k", np.ones(2, np.float32), np.asarray(p["params"]["conv"]["kernel"])[0, 0]
    )
    want = np.maximum((conv_out - 0.5) / np.sqrt(4.0 + 1e-3) * 2.0 + 0.1, 0.0)
    got = np.asarray(m.apply(p, x))[0, 0, 0]
    np.testing.assert_allclose(got, want, rtol=1e-5)
