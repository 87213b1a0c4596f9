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
