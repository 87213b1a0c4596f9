"""Pallas fused gated-DSConv block (Uformer conformer stack, VERDICT r1
item 2).

One DSConv block (ref dsconv2d_cplx.py:11-60 / dsconv2d_real.py) is
LN -> 1x1 conv -> PReLU -> two dilated (3,3) convs -> gate -> LN ->
self-gate -> 1x1 conv -> residual. Driven as XLA ops, the block pays an
HBM round trip between each of its ~9 stages; the 16-block stack is the
largest single chunk of Uformer step time (PERF.md). This kernel runs the
WHOLE block per batch item in VMEM:

- grid (B,) with full (T, F, C) blocks (bottleneck T~400, F=4 fits easily);
- the complex branch arrives channel-concat [re | im] with INTERLEAVED
  block weights ([[Wr, Wi], [-Wi, Wr]], see nn/conv.py), so complex math
  is plain matmuls; `ncomp` tells the kernel how many per-component
  LayerNorm segments the channel axis holds (2 complex, 1 real);
- dilated convs are 9 shifted (T*F, Cm) x (Cm, Cm) matmuls over a
  zero-padded copy built in-kernel.

Backward runs the jnp reference via custom VJP (same pattern as
ops/pallas_lstm.py). Numerics match the composed-module path to fp32
round-off (tests/test_pallas_dsconv.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-5


def _ln_percomp(x, gamma_full, beta_full, ncomp):
    """LayerNorm over each of `ncomp` equal channel segments with SHARED
    scale/bias. x (rows, ncomp*C) 2-D; gamma_full/beta_full (ncomp*C,)
    (the shared params pre-tiled). Segment means/vars go through one-hot
    matmuls instead of a lane-splitting reshape (Mosaic rejects
    (rows, 2C) -> (rows, 2, C) shape casts)."""
    cin = x.shape[-1]
    c = cin // ncomp
    cid = jax.lax.broadcasted_iota(jnp.int32, (cin, ncomp), 0) // c
    sid = jax.lax.broadcasted_iota(jnp.int32, (cin, ncomp), 1)
    sel = (cid == sid).astype(jnp.float32)  # (Cin, ncomp) one-hot
    mu = jnp.dot(x, sel, preferred_element_type=jnp.float32) / c
    mu_b = jnp.dot(mu, sel.T, preferred_element_type=jnp.float32)
    d = x - mu_b
    var = jnp.dot(d * d, sel, preferred_element_type=jnp.float32) / c
    var_b = jnp.dot(var, sel.T, preferred_element_type=jnp.float32)
    return d * jax.lax.rsqrt(var_b + _LN_EPS) * gamma_full + beta_full


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def _block_math(x, params, d1: int, d2: int, ncomp: int):
    """The whole DSConv block on one batch item. x (T, F, Cin) fp32.
    g1/b1 are pre-tiled to (ncomp*C,), g2/b2 to (ncomp*Cm,); the dilated
    conv kernels wd1/wd2 arrive flattened to (9*Cm, Cm) in (i, j, cin)
    row order (im2col layout)."""
    (g1, b1, w1, bb1, alpha, wd1, bd1, wd2, bd2,
     g2, b2, ws, bs) = params
    t, f, cin = x.shape
    cm = w1.shape[1]

    x2 = x.reshape(t * f, cin)
    y = _ln_percomp(x2, g1, b1, ncomp)
    y = y @ w1 + bb1  # 1x1 conv
    y = _prelu(y, alpha)
    y3 = y.reshape(t, f, cm)

    def dconv(w9, b, d):
        # in-VMEM im2col: 9 shifted taps lane-concatenated into one
        # (T*F, 9*Cm) patch matrix -> ONE matmul with K=9*Cm (full MXU
        # tiles) instead of 9 K=N=Cm quarter-tile matmuls
        yp = jnp.pad(y3, ((d, d), (1, 1), (0, 0)))
        taps = [yp[i * d : i * d + t, j : j + f].reshape(t * f, cm)
                for i in range(3) for j in range(3)]
        patches = jnp.concatenate(taps, axis=-1)
        return jnp.dot(patches, w9,
                       preferred_element_type=jnp.float32) + b

    a = dconv(wd1, bd1, d1)
    g = dconv(wd2, bd2, d2)
    z = a * jax.nn.sigmoid(g)
    z = _ln_percomp(z, g2, b2, ncomp)
    z = z * jax.nn.sigmoid(z)
    out = z @ ws + bs
    return (x2 + out).reshape(t, f, cin)


def _kernel(x_ref, *refs, d1: int, d2: int, ncomp: int):
    o_ref = refs[-1]
    params = tuple(r[:] if r.ndim > 1 else r[:] for r in refs[:-1])
    # scalars arrive as (1, 1); biases as (1, C) — squeeze to kernel shapes
    (g1, b1, w1, bb1, alpha, wd1, bd1, wd2, bd2,
     g2, b2, ws, bs) = params
    params = (g1[0], b1[0], w1, bb1[0], alpha[0, 0], wd1, bd1[0],
              wd2, bd2[0], g2[0], b2[0], ws, bs[0])
    x = x_ref[0].astype(jnp.float32)
    o_ref[0] = _block_math(x, params, d1, d2, ncomp).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("d1", "d2", "ncomp",
                                              "interpret"))
def _pallas_dsconv(x, params, d1: int, d2: int, ncomp: int,
                   interpret: bool):
    b, t, f, cin = x.shape
    kernel = functools.partial(_kernel, d1=d1, d2=d2, ncomp=ncomp)
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((1, t, f, cin), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [full(p) for p in params]
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, t, f, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, *params)


def _reference(x, params, d1: int, d2: int, ncomp: int):
    (g1, b1, w1, bb1, alpha, wd1, bd1, wd2, bd2,
     g2, b2, ws, bs) = params
    p = (g1[0], b1[0], w1, bb1[0], alpha[0, 0], wd1, bd1[0], wd2, bd2[0],
         g2[0], b2[0], ws, bs[0])
    return jax.vmap(
        lambda xi: _block_math(xi.astype(jnp.float32), p, d1, d2, ncomp)
    )(x).astype(x.dtype)


@functools.lru_cache(maxsize=64)
def _fused(d1: int, d2: int, ncomp: int, interpret: bool):
    @jax.custom_vjp
    def f(x, *params):
        return _pallas_dsconv(x, params, d1, d2, ncomp, interpret)

    def fwd(x, *params):
        return _pallas_dsconv(x, params, d1, d2, ncomp, interpret), \
            (x,) + params

    def bwd(res, g):
        _, vjp = jax.vjp(
            lambda x, *p: _reference(x, p, d1, d2, ncomp), *res)
        return vjp(g.astype(res[0].dtype))

    f.defvjp(fwd, bwd)
    return f


def dsconv_block(x, params, d1: int, d2: int, ncomp: int,
                 interpret: bool | None = None):
    """x (B, T, F, Cin) channel-concat input -> same shape (residual
    included). `params` is the 13-tuple documented in _block_math, with
    vectors shaped (1, C) and the PReLU scalar (1, 1)."""
    from se_tpu.parallel.mesh import active_mesh, shard_map_leading
    from se_tpu.utils.envflags import env_flag

    if interpret is None:
        platform = jax.devices()[0].platform
        if (platform not in ("tpu", "axon")
                or env_flag("SE_TPU_DISABLE_PALLAS_DSCONV")):
            return _reference(x, tuple(params), d1, d2, ncomp)
        interpret = False
    fn = _fused(d1, d2, ncomp, bool(interpret))
    mesh = active_mesh()
    if mesh is not None:
        # GSPMD cannot partition pallas_call; run per-shard over the batch
        # axis (the block is independent per batch item)
        mapped = shard_map_leading(fn, mesh, x.shape[0], n_mapped=1,
                                   n_replicated=len(params))
        if mapped is None:
            return _reference(x, tuple(params), d1, d2, ncomp)
        return mapped(x, *params)
    return fn(x, *params)
