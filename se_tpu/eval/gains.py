"""Statistical gain functions (ref: DeepXi/deepxi/gain.py:13-192).

All functions are pure jnp and jittable; the Bessel (i0/i1) and exponential-
integral (E1) terms ride jax.scipy.special (the reference leans on
tf.math.bessel_* and scipy.special.exp1).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import i0, i1


def exp1(x):
    """Exponential integral E1(x) for x > 0, branch-free.

    jax.scipy.special.exp1 lowers to data-dependent while-loops that are slow
    to compile and hostile to TPU; this uses the classic Abramowitz & Stegun
    polynomial (5.1.53, |err| < 2e-7 for x<=1) and rational (5.1.56,
    |rel err| < 5e-5 for x>1) approximations, combined with a select.
    """
    x = jnp.maximum(x, 1e-12)
    # x <= 1: E1 = -ln(x) + sum a_k x^k
    a = (-0.57721566, 0.99999193, -0.24991055,
         0.05519968, -0.00976004, 0.00107857)
    small = -jnp.log(x) + a[0] + x * (
        a[1] + x * (a[2] + x * (a[3] + x * (a[4] + x * a[5])))
    )
    # x > 1: x e^x E1 = (x^2 + a1 x + a2) / (x^2 + b1 x + b2)
    xs = jnp.maximum(x, 1.0)  # keep the large-branch math well-conditioned
    num = xs * xs + 2.334733 * xs + 0.250621
    den = xs * xs + 3.330657 * xs + 1.681534
    large = jnp.exp(-xs) / xs * (num / den)
    return jnp.where(x <= 1.0, small, large)


def wf(xi):
    """Wiener filter."""
    return xi / (xi + 1.0)


def srwf(xi):
    """Square-root Wiener filter."""
    return jnp.sqrt(wf(xi))


def cwf(xi):
    """Constrained Wiener filter (ref gain.py:95-105)."""
    return wf(jnp.sqrt(xi))


def irm(xi):
    """Ideal ratio mask (== srwf)."""
    return srwf(xi)


def ibm(xi):
    """Ideal binary mask at 0 dB."""
    return (xi > 1.0).astype(jnp.float32)


def mmse_stsa(xi, gamma):
    """MMSE short-time spectral amplitude estimator (Bessel form) with
    Wiener fallback on NaN/Inf (ref gain.py:13-45)."""
    xi = jnp.maximum(xi, 1e-12)
    gamma = jnp.maximum(gamma, 1e-12)
    nu = xi * gamma / (1.0 + xi)
    g = (
        (jnp.sqrt(jnp.pi) / 2.0)
        * (jnp.sqrt(nu) / gamma)
        * jnp.exp(-nu / 2.0)
        * ((1.0 + nu) * i0(nu / 2.0) + nu * i1(nu / 2.0))
    )
    bad = jnp.isnan(g) | jnp.isinf(g)
    return jnp.where(bad, wf(xi), g)


def mmse_lsa(xi, gamma):
    """MMSE log-spectral amplitude estimator (ref gain.py:47-69)."""
    xi = jnp.maximum(xi, 1e-12)
    gamma = jnp.maximum(gamma, 1e-12)
    v1 = xi / (1.0 + xi)
    nu = v1 * gamma
    return v1 * jnp.exp(0.5 * exp1(nu))


def dgwf(xi, cdm):
    """Dual-gain Wiener filter (ref gain.py:107-127)."""
    v1 = 2.0 / jnp.pi
    v2 = 2.0 * v1
    v3 = jnp.sqrt(xi)
    v4 = xi + 1.0
    g_minus = (xi - v1 * v3) / (v4 - v2 * v3)
    g_plus = (xi + v1 * v3) / (v4 + v2 * v3)
    return jnp.where(cdm, g_plus, g_minus)


def deepmmse(xi, gamma):
    """MMSE noise-periodogram estimate gain (ref gain.py:150-167)."""
    return 1.0 / jnp.square(1.0 + xi) + xi / (gamma * (1.0 + xi))


def gfunc(xi, gamma=None, gtype="mmse-lsa", cdm=None):
    """Gain dispatcher (ref gain.py:169-192)."""
    if gtype == "mmse-lsa":
        return mmse_lsa(xi, gamma)
    if gtype == "mmse-stsa":
        return mmse_stsa(xi, gamma)
    if gtype == "wf":
        return wf(xi)
    if gtype == "srwf":
        return srwf(xi)
    if gtype == "cwf":
        return cwf(xi)
    if gtype == "dgwf":
        return dgwf(xi, cdm)
    if gtype == "irm":
        return irm(xi)
    if gtype == "ibm":
        return ibm(xi)
    if gtype == "deepmmse":
        return deepmmse(xi, gamma)
    raise ValueError(f"invalid gain function type {gtype!r}")
