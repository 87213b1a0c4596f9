"""Golden forward tests for the DeepXi networks against independent numpy
oracles (VERDICT r1 item 5 — all 11 families now have numeric oracles).

Pattern follows tests/torch_complexnn.py: the oracle re-derives the
reference math (tcn.py / attention.py) without JAX; weights are shared by
initializing the flax module and feeding its params to the oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from numpy_deepxi_oracle import mhanet_forward, resnet_v2_forward

from se_tpu.models.deepxi import MHANet, ResNet, ResNetV2, ResNetV3


def _feats(rng, b=2, t=37, f=33):
    return (rng.standard_normal((b, t, f)) * 0.5).astype(np.float32)


SMALL = dict(n_outp=33, n_blocks=6, d_model=48, d_f=16, k=3, max_d_rate=4)


@pytest.mark.parametrize("unit_type", ["ReLU->LN->W+b", "LN->ReLU->W+b"])
def test_resnet_v2_matches_numpy_oracle(rng, unit_type):
    model = ResNetV2(unit_type=unit_type, **SMALL)
    x = _feats(rng)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    want = resnet_v2_forward(params, x, n_blocks=SMALL["n_blocks"],
                             max_d_rate=SMALL["max_d_rate"], k=SMALL["k"],
                             unit_type=unit_type, variant="v2")
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_resnet_v1_matches_numpy_oracle(rng):
    model = ResNet(**SMALL)
    x = _feats(rng)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(x))["params"]
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    want = resnet_v2_forward(params, x, n_blocks=SMALL["n_blocks"],
                             max_d_rate=SMALL["max_d_rate"], k=SMALL["k"],
                             variant="v1")
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_resnet_v3_matches_numpy_oracle(rng):
    model = ResNetV3(**SMALL)
    x = _feats(rng)
    params = model.init(jax.random.PRNGKey(2), jnp.asarray(x))["params"]
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    want = resnet_v2_forward(params, x, n_blocks=SMALL["n_blocks"],
                             max_d_rate=SMALL["max_d_rate"], k=SMALL["k"],
                             variant="v3")
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_mhanet_matches_numpy_oracle_with_padding(rng, causal):
    """Includes zero-padded tail frames so the Masking(0.0)-derived
    attention + sequence masks are exercised, not just the causal mask."""
    model = MHANet(n_outp=33, d_model=32, n_blocks=2, n_heads=4,
                   causal=causal)
    x = _feats(rng, b=2, t=24, f=33)
    x[0, 18:] = 0.0  # padded tail on one batch element
    params = model.init(jax.random.PRNGKey(3), jnp.asarray(x))["params"]
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    want = mhanet_forward(params, x, n_blocks=2, n_heads=4, causal=causal)
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_mhanet_v2_matches_numpy_oracle_with_padding(rng, causal):
    """MHANetV2 (tfa.MultiHeadAttention semantics, ref attention.py:278-385):
    boolean mask as -10e9 additive, no post-softmax sequence re-zeroing.
    Padded tail frames included so V2's distinct masking path is pinned."""
    model = MHANet(n_outp=33, d_model=32, n_blocks=2, n_heads=4,
                   causal=causal, v2=True)
    x = _feats(rng, b=2, t=24, f=33)
    x[0, 18:] = 0.0
    params = model.init(jax.random.PRNGKey(6), jnp.asarray(x))["params"]
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    want = mhanet_forward(params, x, n_blocks=2, n_heads=4, causal=causal,
                          v2=True)
    # Compare VALID frames only: on fully-padded query rows the -10e9
    # additive mask absorbs the logit differences in fp32 (uniform softmax,
    # what tf fp32 also produces) but not in the float64 oracle. Valid rows
    # never read padded keys (masked to -10e9 pre-softmax), so they agree.
    np.testing.assert_allclose(got[0, :18], want[0, :18], atol=2e-5)
    np.testing.assert_allclose(got[1], want[1], atol=2e-5)
    # and V2 genuinely differs from V1 on padded inputs (un-aliased)
    want_v1 = mhanet_forward(params, x, n_blocks=2, n_heads=4, causal=causal)
    assert not np.allclose(want, want_v1, atol=1e-6)


def test_mhanet_v2_selectable_via_deepxi(rng):
    from se_tpu.models.deepxi import DeepXi

    model = DeepXi(network="MHANetV2", n_feat=33,
                   network_kwargs=(("d_model", 32), ("n_blocks", 1),
                                   ("n_heads", 4)))
    x = _feats(rng, b=1, t=12, f=33)
    variables = model.init(jax.random.PRNGKey(7), jnp.asarray(x))
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert out.shape == (1, 12, 33)
    assert np.all((out >= 0) & (out <= 1))


def test_mhanet_v3_learned_pos_matches_numpy_oracle(rng):
    model = MHANet(n_outp=33, d_model=32, n_blocks=2, n_heads=4,
                   causal=True, learned_pos=True, max_len=64)
    x = _feats(rng, b=2, t=20, f=33)
    params = model.init(jax.random.PRNGKey(4), jnp.asarray(x))["params"]
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    want = mhanet_forward(params, x, n_blocks=2, n_heads=4, causal=True,
                          learned_pos=True)
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow
def test_resnet_v2_full_size_matches_numpy_oracle(rng):
    """One full-size (reference-config) case: 40 blocks, d_model 256."""
    model = ResNetV2()
    x = _feats(rng, b=1, t=40, f=257)
    params = model.init(jax.random.PRNGKey(5), jnp.asarray(x))["params"]
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    want = resnet_v2_forward(params, x, n_blocks=40, max_d_rate=16, k=3)
    np.testing.assert_allclose(got, want, atol=1e-4)
