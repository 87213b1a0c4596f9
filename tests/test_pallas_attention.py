"""Fused VMEM attention kernel vs the einsum reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from se_tpu.ops.pallas_attention import _reference, sdp_attention


def _qkv(rng, n=3, h=2, l=65, d=16):
    mk = lambda: jnp.asarray(rng.standard_normal((n, h, l, d)) * 0.3,
                             jnp.float32)
    return mk(), mk(), mk()


def test_fused_attention_matches_einsum(rng):
    q, k, v = _qkv(rng)
    scale = 1.0 / np.sqrt(16)
    want = _reference(q, k, v, scale)
    got = sdp_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6)


def test_fused_attention_odd_length(rng):
    q, k, v = _qkv(rng, n=2, h=1, l=401, d=16)
    scale = 0.25
    want = _reference(q, k, v, scale)
    got = sdp_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6)


def test_fused_attention_grad_matches(rng):
    q, k, v = _qkv(rng, n=2, h=2, l=70, d=8)
    scale = 1.0 / np.sqrt(8)

    def loss_pallas(q, k, v):
        return jnp.sum(sdp_attention(q, k, v, scale, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, scale) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_small_l_uses_reference_path(rng):
    q, k, v = _qkv(rng, l=4)
    out = sdp_attention(q, k, v, 0.5)  # F-attention shape: einsum fallback
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_reference(q, k, v, 0.5)),
                               atol=1e-6)
