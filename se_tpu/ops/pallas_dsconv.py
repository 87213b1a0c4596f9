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

from se_tpu.utils.envflags import env_flag

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
    # Mosaic can only squeeze 32-bit scalars: cast alpha before [0, 0]
    params = (g1[0], b1[0], w1, bb1[0],
              alpha.astype(jnp.float32)[0, 0], wd1, bd1[0],
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


@functools.lru_cache(maxsize=16)
def _dconv33(d: int):
    """3x3 T-dilated conv with a matmul-shaped WEIGHT gradient.

    XLA:TPU's emitter for this conv's dW (a reverse conv whose window
    spans the whole T axis) is pathological: measured round 4, the
    uformer train step at B=8 x 4 s ran 16.3 s/step and the slowdown
    bisects exactly to these two dconvs' param grads (12.2 s/step for the
    dsconv group alone at B=4, T=101, vs 8.7 ms for input grads). The
    forward and the input gradient use the fast native conv emitter
    unchanged; only dW is overridden: an explicit 9-tap im2col einsum —
    one (9C, B*T*F) @ (B*T*F, O) contraction on the MXU.

    Restriction: custom_vjp makes this (and every dsconv route through
    `_reference`) reverse-mode-only — jax.jvp/jax.linearize/jax.hessian
    over models using these blocks will raise. Set
    SE_TPU_DISABLE_DCONV33_VJP=1 to restore the plain conv (forward-mode
    capable, pathological dW on TPU)."""
    from jax import lax

    def conv_only(y, w):
        return lax.conv_general_dilated(
            y, w, window_strides=(1, 1), padding=((d, d), (1, 1)),
            rhs_dilation=(d, 1), dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.custom_vjp
    def f(y, w):
        return conv_only(y, w)

    def fwd(y, w):
        return conv_only(y, w), (y, w)

    def bwd(res, g):
        y, w = res
        _, pull = jax.vjp(lambda yy: conv_only(yy, w), y)
        dy, = pull(g)
        t, fdim = y.shape[1], y.shape[2]
        yp = jnp.pad(y, ((0, 0), (d, d), (1, 1), (0, 0)))
        # memory note (ADVICE r4): `pat` is a transient 9x activation
        # spike per dconv backward. At the measured envelope (uformer
        # B=32 x 4 s trains in-HBM, PERF.md sweep) it is fine; if larger
        # B*T ever pressures HBM, accumulate the 9 per-tap contractions
        # in a loop instead of stacking.
        pat = jnp.stack(
            [yp[:, i * d:i * d + t, j:j + fdim, :]
             for i in range(3) for j in range(3)], axis=3)  # (B,T,F,9,C)
        dw = jnp.einsum("btfkc,btfo->kco", pat, g,
                        preferred_element_type=jnp.float32)
        return dy, dw.reshape(w.shape).astype(w.dtype)

    f.defvjp(fwd, bwd)
    return f


def _reference(x, params, d1: int, d2: int, ncomp: int):
    """Composed-op reference of the same block (lax.conv / dense — the
    compile-friendly fallback and VJP recompute path; inlining the
    kernel's im2col math through vmap blows XLA compile memory: the
    remote TPU compiler's helper got OOM-killed on a 16-block graph and
    XLA:CPU took >25 min for jit(init))."""
    from jax import lax

    (g1, b1, w1, bb1, alpha, wd1, bd1, wd2, bd2,
     g2, b2, ws, bs) = params
    tot = w1.shape[1]
    x32 = x.astype(jnp.float32)

    def ln(z, g, b):
        c = z.shape[-1] // ncomp
        zs = z.reshape(z.shape[:-1] + (ncomp, c))
        mu = zs.mean(-1, keepdims=True)
        var = jnp.square(zs - mu).mean(-1, keepdims=True)
        zn = ((zs - mu) * jax.lax.rsqrt(var + _LN_EPS)).reshape(z.shape)
        return zn * g[0] + b[0]

    y = ln(x32, g1, b1)
    y = y @ w1 + bb1[0]
    y = _prelu(y, alpha[0, 0])

    def dconv(w9, b, d):
        # w9 rows are (i, j, cin) — exactly HWIO when reshaped
        w = w9.reshape(3, 3, tot, tot)
        if env_flag("SE_TPU_DISABLE_DCONV33_VJP"):
            # ablation toggle (VERDICT r4 item 3): native conv emitter for
            # the weight gradient too
            return lax.conv_general_dilated(
                y, w.astype(y.dtype), window_strides=(1, 1),
                padding=((d, d), (1, 1)), rhs_dilation=(d, 1),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b[0]
        return _dconv33(d)(y, w.astype(y.dtype)) + b[0]

    a = dconv(wd1, bd1, d1)
    g = dconv(wd2, bd2, d2)
    z = a * jax.nn.sigmoid(g)
    z = ln(z, g2, b2)
    z = z * jax.nn.sigmoid(z)
    out = z @ ws + bs[0]
    return (x32 + out).astype(x.dtype)


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
        # OPT-IN ONLY (round 3): measured on-chip at B=32 x 4 s the fused
        # block loses to the composed lax.conv path (headline 1797.5 with
        # this kernel vs 1916.0 composed; the round-2 "win" was against
        # the since-replaced vmap'd-im2col reference, not against XLA's
        # conv emitter). Kept for the numerics tests.
        platform = jax.devices()[0].platform
        if (platform not in ("tpu", "axon")
                or env_flag("SE_TPU_DISABLE_PALLAS_DSCONV")
                or not env_flag("SE_TPU_FORCE_PALLAS_DSCONV")):
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


# ------------------------------------------------- fused cplx+real+fusion

_FUSION_EPS = 1.1920929e-07  # np.finfo(np.float32).eps (fusion.py EPSILON)


def _pair_math(xc, xm, pc, pm, d1: int, d2: int):
    """One conformer DSConv stage on one batch item: complex block
    (ncomp=2, channel-concat [re | im]) + real block (ncomp=1) + the
    cross-branch fusion (ref fusion.py:13-19) — everything in VMEM."""
    yc = _block_math(xc, pc, d1, d2, ncomp=2)
    ym = _block_math(xm, pm, d1, d2, ncomp=1)
    c = yc.shape[-1] // 2
    re, im = yc[..., :c], yc[..., c:]
    cplx_mag = jnp.sqrt(jnp.maximum(re * re + im * im, _FUSION_EPS))
    mag_out = ym + jax.nn.sigmoid(cplx_mag)
    s = jax.nn.sigmoid(ym)
    return jnp.concatenate([re + s, im + s], axis=-1), mag_out


def _squeeze_params(refs):
    (g1, b1, w1, bb1, alpha, wd1, bd1, wd2, bd2, g2, b2, ws, bs) = refs
    # Mosaic can only squeeze 32-bit scalars: cast alpha before [0, 0]
    return (g1[0], b1[0], w1, bb1[0], alpha.astype(jnp.float32)[0, 0],
            wd1, bd1[0], wd2, bd2[0], g2[0], b2[0], ws, bs[0])


def _pair_kernel(xc_ref, xm_ref, *refs, d1: int, d2: int):
    oc_ref, om_ref = refs[-2], refs[-1]
    vals = tuple(r[:] for r in refs[:-2])
    pc = _squeeze_params(vals[:13])
    pm = _squeeze_params(vals[13:])
    yc, ym = _pair_math(xc_ref[0].astype(jnp.float32),
                        xm_ref[0].astype(jnp.float32), pc, pm, d1, d2)
    oc_ref[0] = yc.astype(oc_ref.dtype)
    om_ref[0] = ym.astype(om_ref.dtype)


@functools.partial(jax.jit, static_argnames=("d1", "d2", "interpret"))
def _pallas_pair(xc, xm, params, d1: int, d2: int, interpret: bool):
    b, t, f, cc = xc.shape
    cm = xm.shape[-1]
    kernel = functools.partial(_pair_kernel, d1=d1, d2=d2)
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM)
    item = lambda ch: pl.BlockSpec((1, t, f, ch), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[item(cc), item(cm)] + [full(p) for p in params],
        out_specs=[item(cc), item(cm)],
        out_shape=[jax.ShapeDtypeStruct(xc.shape, xc.dtype),
                   jax.ShapeDtypeStruct(xm.shape, xm.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xc, xm, *params)


def _pair_reference(xc, xm, params, d1: int, d2: int):
    """Composed-op reference (see _reference for why not vmap'd kernel
    math): both blocks + the fusion coupling."""
    yc = _reference(xc, params[:13], d1, d2, ncomp=2).astype(jnp.float32)
    ym = _reference(xm, params[13:], d1, d2, ncomp=1).astype(jnp.float32)
    c = yc.shape[-1] // 2
    re, im = yc[..., :c], yc[..., c:]
    cplx_mag = jnp.sqrt(jnp.maximum(re * re + im * im, _FUSION_EPS))
    mag_out = ym + jax.nn.sigmoid(cplx_mag)
    s = jax.nn.sigmoid(ym)
    return (jnp.concatenate([re + s, im + s], axis=-1).astype(xc.dtype),
            mag_out.astype(xm.dtype))


@functools.lru_cache(maxsize=64)
def _pair_fused(d1: int, d2: int, interpret: bool):
    @jax.custom_vjp
    def f(xc, xm, *params):
        return _pallas_pair(xc, xm, params, d1, d2, interpret)

    def fwd(xc, xm, *params):
        return _pallas_pair(xc, xm, params, d1, d2, interpret), \
            (xc, xm) + params

    def bwd(res, g):
        _, vjp = jax.vjp(
            lambda xc, xm, *p: _pair_reference(xc, xm, p, d1, d2),
            *res)
        gc, gm = g
        return vjp((gc.astype(res[0].dtype), gm.astype(res[1].dtype)))

    f.defvjp(fwd, bwd)
    return f


def dsconv_pair_block(xc, xm, params_c, params_m, d1: int, d2: int,
                      interpret: bool | None = None):
    """One conformer stage — complex DSConv (channel-concat xc), real
    DSConv (xm), and the cross-branch fusion — as ONE pallas_call per
    batch item (two dispatches + an XLA elementwise pass otherwise).
    params_c/params_m are the 13-tuples of dsconv_block."""
    from se_tpu.parallel.mesh import active_mesh, shard_map_leading
    from se_tpu.utils.envflags import env_flag

    params = tuple(params_c) + tuple(params_m)
    if interpret is None:
        # OPT-IN ONLY (round 3): measured slower than the composed path
        # (headline 1814.1 with the pair kernel vs 1916.0 composed; see
        # dsconv_block)
        platform = jax.devices()[0].platform
        if (platform not in ("tpu", "axon")
                or env_flag("SE_TPU_DISABLE_PALLAS_DSCONV")
                or not env_flag("SE_TPU_FORCE_PALLAS_DSCONV")):
            return _pair_reference(xc, xm, params, d1, d2)
        interpret = False
    fn = _pair_fused(d1, d2, bool(interpret))
    mesh = active_mesh()
    if mesh is not None:
        mapped = shard_map_leading(fn, mesh, xc.shape[0], n_mapped=2,
                                   n_replicated=len(params))
        if mapped is None:
            return _pair_reference(xc, xm, params, d1, d2)
        return mapped(xc, xm, *params)
    return fn(xc, xm, *params)
