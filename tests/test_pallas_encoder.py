"""Fused encoder-level kernel vs the composed XLA path (interpret mode on
CPU; the real kernel runs on TPU via the same code)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from se_tpu.ops.pallas_encoder import _reference, encoder_level

EPS = 1.1920929e-07


def _mk_branch(rng, cin, cout):
    k = jnp.asarray(rng.standard_normal((2, 5, cin, cout)) * 0.2,
                    jnp.float32)
    bias = jnp.asarray(rng.standard_normal((1, cout)) * 0.1, jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal((1, cout)),
                        jnp.float32)
    shift = jnp.asarray(0.1 * rng.standard_normal((1, cout)), jnp.float32)
    alpha = jnp.full((1, 1), 0.25, jnp.float32)
    return (k, bias, scale, shift, alpha)


def _composed(xc, xm, pc, pm):
    """Oracle via lax.conv_general_dilated with CConvEnc's exact geometry
    (kernel (2,5), strides (1,2), padding ((1,0),(2,2)))."""

    def branch(x, p):
        w, bias, scale, shift, alpha = p
        y = lax.conv_general_dilated(
            x, w, window_strides=(1, 2), padding=((1, 0), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias[0]
        y = y * scale[0] + shift[0]
        return jnp.where(y >= 0, y, alpha[0, 0] * y)

    yc = branch(xc, pc)
    ym = branch(xm, pm)
    c = yc.shape[-1] // 2
    re, im = yc[..., :c], yc[..., c:]
    cmag = jnp.sqrt(jnp.maximum(re**2 + im**2, EPS))
    mag_out = ym + jax.nn.sigmoid(cmag)
    s = jax.nn.sigmoid(ym)
    return jnp.concatenate([re + s, im + s], axis=-1), mag_out


def test_encoder_level_matches_composed(rng):
    b, t, f = 2, 9, 8
    pc = _mk_branch(rng, 16, 8)
    pm = _mk_branch(rng, 8, 4)
    xc = jnp.asarray(rng.standard_normal((b, t, f, 16)), jnp.float32)
    xm = jnp.asarray(rng.standard_normal((b, t, f, 8)), jnp.float32)

    want_c, want_m = _composed(xc, xm, pc, pm)
    got_c, got_m = encoder_level(xc, xm, pc + pm, interpret=True)
    assert got_c.shape == (b, t, f // 2, 8)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               atol=2e-5)
    ref_c, _ = _reference(xc, xm, pc + pm)
    np.testing.assert_allclose(np.asarray(ref_c), np.asarray(want_c),
                               atol=2e-5)


def test_encoder_level_cin1_first_level(rng):
    """Level 0 geometry: cin=1 per component (spectrum input)."""
    b, t, f = 2, 7, 16
    pc = _mk_branch(rng, 2, 16)
    pm = _mk_branch(rng, 1, 8)
    xc = jnp.asarray(rng.standard_normal((b, t, f, 2)), jnp.float32)
    xm = jnp.asarray(rng.standard_normal((b, t, f, 1)), jnp.float32)
    want_c, want_m = _composed(xc, xm, pc, pm)
    got_c, got_m = encoder_level(xc, xm, pc + pm, interpret=True)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               atol=2e-5)


def test_encoder_level_grad_flows(rng):
    b, t, f = 2, 6, 8
    pc = _mk_branch(rng, 8, 4)
    pm = _mk_branch(rng, 4, 2)
    xc = jnp.asarray(rng.standard_normal((b, t, f, 8)), jnp.float32)
    xm = jnp.asarray(rng.standard_normal((b, t, f, 4)), jnp.float32)

    def loss(xc, xm, w):
        p = (w,) + pc[1:] + pm
        yc, ym = encoder_level(xc, xm, p, interpret=True)
        return jnp.mean(yc**2) + jnp.mean(ym**2)

    g = jax.grad(loss, argnums=(0, 1, 2))(xc, xm, pc[0])
    for a in g:
        assert np.isfinite(np.asarray(a)).all()
        assert float(jnp.abs(a).sum()) > 0


def test_uformer_encoder_wiring_matches_composed(rng, monkeypatch):
    """Full-model check of the fused-encoder WIRING (param-holder tree
    reuse, BN folding, skip collection): fused-path output must equal the
    composed-path output on identical params."""
    from se_tpu.models.uformer import Uformer

    n = 4000
    x = jnp.asarray(rng.standard_normal((1, n)), jnp.float32) * 0.1
    s = jnp.asarray(rng.standard_normal((1, n)), jnp.float32) * 0.1
    model = Uformer()

    monkeypatch.delenv("SE_TPU_FORCE_PALLAS_ENCODER", raising=False)
    variables = model.init(jax.random.PRNGKey(0), x, s)
    want, _, _, _ = model.apply(variables, x, s)

    monkeypatch.setenv("SE_TPU_FORCE_PALLAS_ENCODER", "1")
    got, _, _, _ = model.apply(variables, x, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)
