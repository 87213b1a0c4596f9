"""Fused DSConv block kernel vs the jnp reference, and the reference vs
the historical composed-module math (via the uformer parity suite, which
exercises weight-converted blocks end to end)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from se_tpu.ops.pallas_dsconv import _reference, dsconv_block


def _params(rng, cin, cm, ncomp):
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32)
    return (r(1, cin) + 1.0, r(1, cin),
            r(ncomp * (cin // ncomp), ncomp * cm) * 0.1, r(1, ncomp * cm),
            jnp.asarray([[0.25]], jnp.float32),
            r(9 * ncomp * cm, ncomp * cm) * 0.1, r(1, ncomp * cm),
            r(9 * ncomp * cm, ncomp * cm) * 0.1, r(1, ncomp * cm),
            r(1, ncomp * cm) + 1.0, r(1, ncomp * cm),
            r(ncomp * cm, cin) * 0.1, r(1, cin))


@pytest.mark.parametrize("ncomp,d1,d2", [(2, 1, 8), (2, 4, 4), (1, 2, 16)])
def test_dsconv_kernel_matches_reference(rng, ncomp, d1, d2):
    cin = 32 * ncomp  # channel-concat total
    cm = 16
    params = _params(rng, cin, cm, ncomp)
    x = jnp.asarray(rng.standard_normal((2, 40, 4, cin)) * 0.3, jnp.float32)
    want = _reference(x, params, d1, d2, ncomp)
    got = dsconv_block(x, params, d1, d2, ncomp, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_dsconv_grad_matches_reference(rng):
    cin, cm, ncomp = 32, 8, 2
    params = _params(rng, cin, cm, ncomp)
    x = jnp.asarray(rng.standard_normal((1, 12, 4, cin)) * 0.3, jnp.float32)

    def loss_pallas(x, p0):
        p = (p0,) + params[1:]
        return jnp.sum(dsconv_block(x, p, 2, 4, ncomp, interpret=True) ** 2)

    def loss_ref(x, p0):
        p = (p0,) + params[1:]
        return jnp.sum(_reference(x, p, 2, 4, ncomp) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1))(x, params[0])
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, params[0])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_dsconv_module_composed_equivalence(rng):
    """The new module (reference path on CPU) matches the round-1 composed
    implementation rebuilt inline from the same params."""
    from flax.core import freeze  # noqa: F401
    from se_tpu.models.uformer import DSConvCplx

    blk = DSConvCplx(16, 2, 8)
    re = jnp.asarray(rng.standard_normal((2, 30, 4, 32)) * 0.3, jnp.float32)
    im = jnp.asarray(rng.standard_normal((2, 30, 4, 32)) * 0.3, jnp.float32)
    vs = blk.init(jax.random.PRNGKey(0), re, im)
    out_r, out_i = blk.apply(vs, re, im)

    # composed re-implementation from the same param tree
    import jax.numpy as jnp2
    from jax import lax

    p = vs["params"]

    def ln(x, q):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return ((x - mu) / jnp2.sqrt(var + 1e-5)) * q["scale"] + q["bias"]

    def cconv(x_re, x_im, q, pad, dil):
        def conv(z, kern):
            return lax.conv_general_dilated(
                z, kern, (1, 1), pad, rhs_dilation=dil,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        rr = conv(x_re, q["real_conv"]["kernel"])
        ii = conv(x_im, q["imag_conv"]["kernel"])
        ri = conv(x_re, q["imag_conv"]["kernel"])
        ir = conv(x_im, q["real_conv"]["kernel"])
        o_re = rr - ii + (q["real_conv"]["bias"] - q["imag_conv"]["bias"])
        o_im = ri + ir + (q["real_conv"]["bias"] + q["imag_conv"]["bias"])
        return o_re, o_im

    a = p["prelu"]["weight"]
    yr, yi = ln(re, p["ln1"]), ln(im, p["ln1"])
    yr, yi = cconv(yr, yi, p["conv1x1"], ((0, 0), (0, 0)), (1, 1))
    prelu = lambda v: jnp2.where(v >= 0, v, a * v)
    yr, yi = prelu(yr), prelu(yi)
    ar, ai = cconv(yr, yi, p["dconv1"], ((2, 2), (1, 1)), (2, 1))
    gr, gi = cconv(yr, yi, p["dconv2"], ((8, 8), (1, 1)), (8, 1))
    zr, zi = ar * jax.nn.sigmoid(gr), ai * jax.nn.sigmoid(gi)
    zr, zi = ln(zr, p["ln2"]), ln(zi, p["ln2"])
    zr, zi = zr * jax.nn.sigmoid(zr), zi * jax.nn.sigmoid(zi)
    zr, zi = cconv(zr, zi, p["sconv"], ((0, 0), (0, 0)), (1, 1))
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(re + zr),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(im + zi),
                               atol=3e-5)


def test_dsconv_pair_matches_composed(rng):
    """dsconv_pair_block (cplx + real + fusion in one dispatch) must match
    the composed dsconv_block + dsconv_block + fusion path."""
    import jax.numpy as jnp

    from se_tpu.ops.pallas_dsconv import (
        _reference, dsconv_pair_block,
    )

    b, t, f, c, cm = 3, 16, 4, 8, 8

    def mk(c_in, tot, r):
        return (
            jnp.ones((1, c_in)), jnp.zeros((1, c_in)),
            jnp.asarray(r.standard_normal((c_in, tot)) * 0.1, jnp.float32),
            jnp.zeros((1, tot)), jnp.full((1, 1), 0.25, jnp.float32),
            jnp.asarray(r.standard_normal((9 * tot, tot)) * 0.1,
                        jnp.float32),
            jnp.zeros((1, tot)),
            jnp.asarray(r.standard_normal((9 * tot, tot)) * 0.1,
                        jnp.float32),
            jnp.zeros((1, tot)),
            jnp.ones((1, tot)), jnp.zeros((1, tot)),
            jnp.asarray(r.standard_normal((tot, c_in)) * 0.1, jnp.float32),
            jnp.zeros((1, c_in)),
        )

    pc = mk(2 * c, 2 * cm, rng)   # complex: channel-concat, ncomp=2
    pm = mk(c, cm, rng)           # real: ncomp=1
    xc = jnp.asarray(rng.standard_normal((b, t, f, 2 * c)), jnp.float32)
    xm = jnp.asarray(rng.standard_normal((b, t, f, c)), jnp.float32)

    yc_ref = _reference(xc, pc, 1, 2, ncomp=2)
    ym_ref = _reference(xm, pm, 1, 2, ncomp=1)
    import flax.linen as nn

    eps = 1.1920929e-07
    re, im = yc_ref[..., :c], yc_ref[..., c:]
    cmag = jnp.sqrt(jnp.maximum(re**2 + im**2, eps))
    m_out = ym_ref + nn.sigmoid(cmag)
    s = nn.sigmoid(ym_ref)
    want_c = jnp.concatenate([re + s, im + s], axis=-1)

    got_c, got_m = dsconv_pair_block(xc, xm, pc, pm, 1, 2, interpret=True)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(m_out),
                               atol=2e-5)


def test_dsconv_pair_grad_flows(rng):
    import jax
    import jax.numpy as jnp

    from se_tpu.ops.pallas_dsconv import dsconv_pair_block

    b, t, f, c, cm = 2, 8, 4, 8, 8
    r = rng

    def mk(c_in, tot):
        return (
            jnp.ones((1, c_in)), jnp.zeros((1, c_in)),
            jnp.asarray(r.standard_normal((c_in, tot)) * 0.1, jnp.float32),
            jnp.zeros((1, tot)), jnp.full((1, 1), 0.25, jnp.float32),
            jnp.asarray(r.standard_normal((9 * tot, tot)) * 0.1,
                        jnp.float32),
            jnp.zeros((1, tot)),
            jnp.asarray(r.standard_normal((9 * tot, tot)) * 0.1,
                        jnp.float32),
            jnp.zeros((1, tot)),
            jnp.ones((1, tot)), jnp.zeros((1, tot)),
            jnp.asarray(r.standard_normal((tot, c_in)) * 0.1, jnp.float32),
            jnp.zeros((1, c_in)),
        )

    pc, pm = mk(2 * c, 2 * cm), mk(c, cm)
    xc = jnp.asarray(rng.standard_normal((b, t, f, 2 * c)), jnp.float32)
    xm = jnp.asarray(rng.standard_normal((b, t, f, c)), jnp.float32)

    def loss(xc, xm):
        yc, ym = dsconv_pair_block(xc, xm, pc, pm, 1, 1, interpret=True)
        return jnp.mean(yc**2) + jnp.mean(ym**2)

    gc, gm = jax.grad(loss, argnums=(0, 1))(xc, xm)
    assert np.isfinite(np.asarray(gc)).all()
    assert np.isfinite(np.asarray(gm)).all()
    assert float(jnp.abs(gc).sum()) > 0 and float(jnp.abs(gm).sum()) > 0


@pytest.mark.parametrize("d", [1, 2, 5])
def test_dconv33_custom_weight_grad_matches_native(rng, d):
    """_dconv33's matmul-shaped dW (the round-4 fix for XLA:TPU's
    pathological reverse-conv weight gradient — uformer train step
    16.3 s/step -> see PERF.md) must equal the native conv's gradients."""
    from jax import lax

    from se_tpu.ops.pallas_dsconv import _dconv33

    y = jnp.asarray(rng.standard_normal((2, 17, 4, 6)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 5)) * 0.3, jnp.float32)
    g = jnp.asarray(rng.standard_normal((2, 17, 4, 5)), jnp.float32)

    def plain(y, w):
        return lax.conv_general_dilated(
            y, w, window_strides=(1, 1), padding=((d, d), (1, 1)),
            rhs_dilation=(d, 1), dimension_numbers=("NHWC", "HWIO", "NHWC"))

    f = _dconv33(d)
    np.testing.assert_allclose(np.asarray(f(y, w)), np.asarray(plain(y, w)),
                               atol=1e-5)
    g1 = jax.grad(lambda y, w: jnp.sum(f(y, w) * g), argnums=(0, 1))(y, w)
    g2 = jax.grad(lambda y, w: jnp.sum(plain(y, w) * g), argnums=(0, 1))(y, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)
