"""Fused decoder-level kernel vs the composed XLA path (interpret mode on
CPU; the real kernel runs on TPU via the same code)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from se_tpu.nn.conv import phase_split_tconv_f
from se_tpu.ops.pallas_decoder import (
    _reference, decoder_level, split_phase_weights,
)

EPS = 1.1920929e-07


def _mk_branch(rng, cin, cout):
    k = jnp.asarray(rng.standard_normal((2, 5, cin, cout)) * 0.2,
                    jnp.float32)
    w_even, w_odd = split_phase_weights(k)
    bias = jnp.asarray(rng.standard_normal((1, cout)) * 0.1, jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal((1, cout)),
                        jnp.float32)
    shift = jnp.asarray(0.1 * rng.standard_normal((1, cout)), jnp.float32)
    alpha = jnp.full((1, 1), 0.25, jnp.float32)
    return k, (w_even, w_odd, bias, scale, shift, alpha)


def _composed(xc, xm, kc, km, pc, pm, has_bn):
    """Oracle via nn.conv.phase_split_tconv_f (itself equivalence-tested
    against the lhs_dilation formulation) + eval-BN affine + PReLU +
    fusion."""
    t = xc.shape[1]

    def branch(x, k, p):
        _, _, bias, scale, shift, alpha = p
        y = phase_split_tconv_f(x, k, 0, 2, 0, 1)[:, :t] + bias[0]
        if has_bn:
            y = y * scale[0] + shift[0]
            y = jnp.where(y >= 0, y, alpha[0, 0] * y)
        return y

    yc = branch(xc, kc, pc)
    ym = branch(xm, km, pm)
    c = yc.shape[-1] // 2
    re, im = yc[..., :c], yc[..., c:]
    cmag = jnp.sqrt(jnp.maximum(re**2 + im**2, EPS))
    mag_out = ym + jax.nn.sigmoid(cmag)
    s = jax.nn.sigmoid(ym)
    return jnp.concatenate([re + s, im + s], axis=-1), mag_out


@pytest.mark.parametrize("has_bn", [True, False])
def test_decoder_level_matches_composed(rng, has_bn):
    b, t, f = 2, 9, 4
    cin_c, cout_c = 16, 8   # complex branch (even cout: re|im halves)
    cin_m, cout_m = 8, 4
    kc, pc = _mk_branch(rng, cin_c, cout_c)
    km, pm = _mk_branch(rng, cin_m, cout_m)
    xc = jnp.asarray(rng.standard_normal((b, t, f, cin_c)), jnp.float32)
    xm = jnp.asarray(rng.standard_normal((b, t, f, cin_m)), jnp.float32)

    want_c, want_m = _composed(xc, xm, kc, km, pc, pm, has_bn)
    got_c, got_m = decoder_level(xc, xm, pc + pm, has_bn, interpret=True)
    assert got_c.shape == (b, t, 2 * f, cout_c)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               atol=2e-5)
    # the jnp reference (bwd recompute path) agrees too
    ref_c, ref_m = _reference(xc, xm, pc + pm, has_bn)
    np.testing.assert_allclose(np.asarray(ref_c), np.asarray(want_c),
                               atol=2e-5)


def test_decoder_level_grad_flows(rng):
    b, t, f = 2, 6, 4
    kc, pc = _mk_branch(rng, 8, 4)
    km, pm = _mk_branch(rng, 4, 2)
    xc = jnp.asarray(rng.standard_normal((b, t, f, 8)), jnp.float32)
    xm = jnp.asarray(rng.standard_normal((b, t, f, 4)), jnp.float32)

    def loss(xc, xm, w):
        p = (w,) + pc[1:] + pm
        yc, ym = decoder_level(xc, xm, p, True, interpret=True)
        return jnp.mean(yc**2) + jnp.mean(ym**2)

    g = jax.grad(loss, argnums=(0, 1, 2))(xc, xm, pc[0])
    for a in g:
        assert np.isfinite(np.asarray(a)).all()
        assert float(jnp.abs(a).sum()) > 0


@pytest.mark.slow
def test_uformer_decoder_wiring_matches_composed(rng, monkeypatch):
    """Full-model check of the fused-decoder WIRING (param-holder tree
    reuse, BN folding, concat order): same params, fused-path output must
    equal the composed-path output. SE_TPU_FORCE_PALLAS_DECODER exercises
    the dispatch on CPU (where decoder_level takes the jnp reference)."""
    from se_tpu.models.uformer import Uformer

    n = 4000
    x = jnp.asarray(rng.standard_normal((1, n)), jnp.float32) * 0.1
    s = jnp.asarray(rng.standard_normal((1, n)), jnp.float32) * 0.1
    model = Uformer()

    monkeypatch.delenv("SE_TPU_FORCE_PALLAS_DECODER", raising=False)
    variables = model.init(jax.random.PRNGKey(0), x, s)
    want, _, _, _ = model.apply(variables, x, s)

    monkeypatch.setenv("SE_TPU_FORCE_PALLAS_DECODER", "1")
    got, _, _, _ = model.apply(variables, x, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)
