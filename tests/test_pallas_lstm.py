"""Pallas fused LSTM layer vs the lax.scan reference path (interpret mode
on CPU; the real kernel runs on TPU via the same code)."""

import numpy as np
import pytest

import jax.numpy as jnp

from se_tpu.nn.recurrent import lstm_layer
from se_tpu.ops.pallas_lstm import pallas_lstm_layer


def _weights(rng, in_dim, h):
    wx = (rng.standard_normal((in_dim, 4 * h)) * 0.2).astype(np.float32)
    wh = (rng.standard_normal((h, 4 * h)) * 0.2).astype(np.float32)
    b = (rng.standard_normal((4 * h,)) * 0.1).astype(np.float32)
    return jnp.asarray(wx), jnp.asarray(wh), jnp.asarray(b)


@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_lstm_matches_scan(rng, reverse):
    b, t, in_dim, h = 16, 12, 8, 16
    x = jnp.asarray(rng.standard_normal((b, t, in_dim)), jnp.float32)
    wx, wh, bias = _weights(rng, in_dim, h)
    want = lstm_layer(x, wx, wh, bias, reverse=reverse)
    got = pallas_lstm_layer(x, wx, wh, bias, reverse=reverse,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6)


def test_pallas_lstm_pads_ragged_batch(rng):
    """Batch not a multiple of the tile: padding rows must not leak."""
    b, t, in_dim, h = 11, 7, 8, 8
    x = jnp.asarray(rng.standard_normal((b, t, in_dim)), jnp.float32)
    wx, wh, bias = _weights(rng, in_dim, h)
    want = lstm_layer(x, wx, wh, bias)
    got = pallas_lstm_layer(x, wx, wh, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_pallas_lstm_bf16_weights(rng):
    """bf16 weights -> bf16 MXU matmuls with fp32 carries, like the scan
    path; outputs agree with the scan path run on the same bf16 weights."""
    b, t, in_dim, h = 8, 10, 8, 16
    x = jnp.asarray(rng.standard_normal((b, t, in_dim)), jnp.bfloat16)
    wx, wh, bias = (w.astype(jnp.bfloat16)
                    for w in _weights(rng, in_dim, h))
    want = lstm_layer(x, wx, wh, bias)
    got = pallas_lstm_layer(x, wx, wh, bias, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2)


def test_pallas_lstm_grad_matches_scan(rng):
    """The custom VJP (chunked-recompute backward) gives the same
    gradients as differentiating the scan path directly."""
    import jax

    b, t, in_dim, h = 8, 6, 8, 8
    x = jnp.asarray(rng.standard_normal((b, t, in_dim)), jnp.float32)
    wx, wh, bias = _weights(rng, in_dim, h)

    def loss_pallas(wx, wh, bias):
        return jnp.sum(pallas_lstm_layer(x, wx, wh, bias,
                                         interpret=True) ** 2)

    def loss_scan(wx, wh, bias):
        return jnp.sum(lstm_layer(x, wx, wh, bias) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(wx, wh, bias)
    g2 = jax.grad(loss_scan, argnums=(0, 1, 2))(wx, wh, bias)
    for a, b2 in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   atol=1e-4, rtol=1e-4)


def test_chunked_backward_matches_scan(rng):
    """_scan_forward_chunked (the VJP's recompute path) must agree with the
    full-precompute scan in values AND gradients, including ragged T
    (t % chunk != 0 exercises the zero-pad path)."""
    import jax

    from se_tpu.ops.pallas_lstm import _scan_forward, _scan_forward_chunked

    b, t, in_dim, h = 8, 37, 8, 16
    x = jnp.asarray(rng.standard_normal((b, t, in_dim)), jnp.float32)
    wx, wh, bias = _weights(rng, in_dim, h)

    y1 = _scan_forward_chunked(x, wx, wh, bias, chunk=16)
    y2 = _scan_forward(x, wx, wh, bias)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-6)

    g1 = jax.grad(lambda *a: jnp.sum(
        _scan_forward_chunked(*a, chunk=16) ** 2), argnums=(0, 1, 2, 3))(
        x, wx, wh, bias)
    g2 = jax.grad(lambda *a: jnp.sum(_scan_forward(*a) ** 2),
                  argnums=(0, 1, 2, 3))(x, wx, wh, bias)
    for a, b2 in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   atol=1e-4, rtol=1e-4)


def test_pallas_lstm_grad_large_folded_batch(rng):
    """FullSubNet-style folded batch (Bf >= _PALLAS_LSTM_MIN_BATCH): the
    TPU-only large-batch training path gets CPU interpret-mode coverage
    (VERDICT r2 item 3) — forward AND backward at the real dispatch size."""
    import jax

    b, t, in_dim, h = 1024, 18, 8, 16
    x = jnp.asarray(rng.standard_normal((b, t, in_dim)), jnp.float32)
    wx, wh, bias = _weights(rng, in_dim, h)

    def loss_pallas(wx, wh, bias):
        return jnp.mean(pallas_lstm_layer(x, wx, wh, bias,
                                          interpret=True) ** 2)

    def loss_scan(wx, wh, bias):
        return jnp.mean(lstm_layer(x, wx, wh, bias) ** 2)

    v1, g1 = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2))(wx, wh, bias)
    v2, g2 = jax.value_and_grad(loss_scan, argnums=(0, 1, 2))(wx, wh, bias)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b2 in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   atol=2e-4, rtol=2e-4)
