"""Pallas fused Uformer encoder level (round 3).

One encoder level (ref Uformer/uformer.py:208-224 + fusion) per branch:
stride-(1,2) conv (2,5) (causal T pad (1,0), F pad (2,2)) -> BN (eval
affine) -> PReLU -> cross-branch fusion. This kernel runs a whole level —
both branches and the fusion — per batch item in VMEM (same rationale as
ops/pallas_decoder.py: the composed path pays an HBM round trip per stage
and the small-channel convs run at poor MXU utilization).

The stride-2 F reads use a PARITY VIEW instead of strided loads: pad F by
(2, 2), reshape (T+1, (F+4)/2, 2, C) (non-lane reshape), and each of the
10 (t, f)-taps becomes a plain slice — output column f reads padded column
2f + jf, i.e. view[..., f + jf//2, jf % 2, :]. Accumulating one matmul per
tap avoids any im2col patch buffer.

Numerics match the composed path to fp32 round-off
(tests/test_pallas_encoder.py); backward runs the jnp reference via custom
VJP (training uses the composed module path anyway).

STATUS (round 3): OPT-IN ONLY (SE_TPU_FORCE_PALLAS_ENCODER). Measured on
the real chip at B=32 x 4 s, whole-level fusion LOSES to XLA's conv
emitter (headline 1813 -> 1127 au-s/s with encoder+decoder kernels on):
the per-batch-item grid serializes 32 small work items, and lane padding
limits it to levels 3-5 (see _vmem_estimate) where XLA is already fast.
Kept for the numerics tests and as a recorded negative result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1.1920929e-07  # np.finfo(np.float32).eps (ref fusion.py EPSILON)


def _conv_stride2(x, w, bias):
    """x (T, F, Cin) -> (T, F//2, Cout): conv kernel (2, 5), strides
    (1, 2), padding T (1, 0) causal, F (2, 2). w (2, 5, Cin, Cout)
    (correlation, HWIO — unflipped); bias (Cout,)."""
    t, f, cin = x.shape
    cout = w.shape[-1]
    f_out = f // 2
    xp = jnp.pad(x, ((1, 0), (2, 2), (0, 0)))  # (T+1, F+4, Cin)
    view = xp.reshape(t + 1, (f + 4) // 2, 2, cin)
    acc = jnp.zeros((t * f_out, cout), jnp.float32)
    for it in range(2):
        for jf in range(5):
            tap = view[it : it + t, jf // 2 : jf // 2 + f_out, jf % 2]
            acc += jnp.dot(tap.reshape(t * f_out, cin), w[it, jf],
                           preferred_element_type=jnp.float32)
    return acc.reshape(t, f_out, cout) + bias


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def _level_math(xc, xm, pc, pm):
    """One encoder level on one batch item. xc (T, F, 2*Cin) channel-concat
    [re | im]; xm (T, F, Cin). pc = (w (2,5,2Cin,2Cout), bias, bn_scale,
    bn_shift, alpha); pm likewise for the real branch."""
    wc, bc, sc, tc, ac = pc
    wm, bm, sm, tm, am = pm
    yc = _conv_stride2(xc, wc, bc)
    ym = _conv_stride2(xm, wm, bm)
    yc = _prelu(yc * sc + tc, ac)
    ym = _prelu(ym * sm + tm, am)
    c = yc.shape[-1] // 2
    re, im = yc[..., :c], yc[..., c:]
    cplx_mag = jnp.sqrt(jnp.maximum(re * re + im * im, _EPS))
    mag_out = ym + jax.nn.sigmoid(cplx_mag)
    s = jax.nn.sigmoid(ym)
    return jnp.concatenate([re + s, im + s], axis=-1), mag_out


def _kernel(xc_ref, xm_ref, *refs):
    oc_ref, om_ref = refs[-2], refs[-1]
    vals = [r[:] for r in refs[:-2]]

    def unpack(v):
        w, b, s, t, a = v
        # Mosaic can only squeeze 32-bit scalars: cast a before [0, 0]
        return (w, b[0], s[0], t[0], a.astype(jnp.float32)[0, 0])

    pc = unpack(vals[:5])
    pm = unpack(vals[5:10])
    yc, ym = _level_math(xc_ref[0].astype(jnp.float32),
                         xm_ref[0].astype(jnp.float32), pc, pm)
    oc_ref[0] = yc.astype(oc_ref.dtype)
    om_ref[0] = ym.astype(om_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_level(xc, xm, params, interpret: bool):
    b, t, f, _ = xc.shape
    cout_c = params[0].shape[-1]
    cout_m = params[5].shape[-1]
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM)
    item = lambda ch, ff: pl.BlockSpec((1, t, ff, ch),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[item(xc.shape[-1], f), item(xm.shape[-1], f)]
        + [full(p) for p in params],
        out_specs=[item(cout_c, f // 2), item(cout_m, f // 2)],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, f // 2, cout_c), xc.dtype),
            jax.ShapeDtypeStruct((b, t, f // 2, cout_m), xm.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xc, xm, *params)


def _reference(xc, xm, params):
    def unpack(v):
        w, b, s, t, a = v
        return (w, b[0], s[0], t[0], a[0, 0])

    pc = unpack(params[:5])
    pm = unpack(params[5:10])
    yc, ym = jax.vmap(
        lambda a, b: _level_math(a.astype(jnp.float32),
                                 b.astype(jnp.float32), pc, pm)
    )(xc, xm)
    return yc.astype(xc.dtype), ym.astype(xm.dtype)


@functools.lru_cache(maxsize=4)
def _fused(interpret: bool):
    @jax.custom_vjp
    def f(xc, xm, *params):
        return _pallas_level(xc, xm, params, interpret)

    def fwd(xc, xm, *params):
        return _pallas_level(xc, xm, params, interpret), (xc, xm) + params

    def bwd(res, g):
        _, vjp = jax.vjp(lambda xc, xm, *p: _reference(xc, xm, p), *res)
        gc, gm = g
        return vjp((gc.astype(res[0].dtype), gm.astype(res[1].dtype)))

    f.defvjp(fwd, bwd)
    return f


def _vmem_estimate(t: int, f: int, cin: int, cout: int) -> int:
    """Padded-VMEM bytes for one grid step (fp32). VMEM arrays tile the
    last two dims to (8, 128); small channel counts on the lane axis pad
    up to 128, so early levels (cin 1/8/16) blow past the 128 MB budget —
    measured on-chip at T=401: level 2 (F=64, cin=16) requires 205 MB,
    level 3 (F=32, cin=32) compiles. Terms: double-buffered in/out
    windows, the two parity views (sublane dim 2 pads to 8), and the
    accumulator + tap buffers."""
    ru = lambda x, m: -(-x // m) * m
    lane = lambda c: ru(max(c, 1), 128)
    b = 2 * t * ru(f, 8) * lane(2 * cin) * 4
    b += 2 * t * ru(f, 8) * lane(cin) * 4
    b += 2 * t * ru(f // 2, 8) * lane(2 * cout) * 4
    b += 2 * t * ru(f // 2, 8) * lane(cout) * 4
    b += (t + 1) * ((f + 4) // 2) * 8 * lane(2 * cin) * 4
    b += (t + 1) * ((f + 4) // 2) * 8 * lane(cin) * 4
    b += t * (f // 2) * (lane(2 * cout) + lane(cout) + 2 * lane(2 * cin)) * 4
    return b


# calibrated on-chip (T=401): level 3 estimates 112 MB and compiles;
# level 2 estimates 216 MB and OOMs (205 MB actual of 128 MB VMEM)
_VMEM_BUDGET = 115 * 1024 * 1024

_warned_vmem: set = set()


def _warn_vmem_fallback(kind: str, est: int, budget: int = _VMEM_BUDGET
                        ) -> None:
    """One-time notice that the VMEM gate routed a level to the XLA
    reference — without it, forced A/B runs (SE_TPU_FORCE_PALLAS_*)
    silently measure the reference path on over-budget levels."""
    key = (kind, est)
    if key in _warned_vmem:
        return
    _warned_vmem.add(key)
    import warnings

    warnings.warn(
        f"pallas {kind}: VMEM estimate {est / 2**20:.0f} MB exceeds budget"
        f" {budget / 2**20:.0f} MB; using XLA reference path for this"
        " level geometry", stacklevel=3)


def encoder_level(xc, xm, params, interpret: bool | None = None):
    """xc (B, T, F, 2*Cin) channel-concat [re | im], xm (B, T, F, Cin) ->
    ((B, T, F//2, 2*C_out), (B, T, F//2, C_out)). `params` is the 10-tuple
    (complex then real branch, each (w (2,5,Cin_b,Cout_b), bias (1, Cout),
    bn_scale (1, Cout), bn_shift (1, Cout), alpha (1, 1)))."""
    from se_tpu.parallel.mesh import active_mesh, shard_map_leading
    from se_tpu.utils.envflags import env_flag

    params = tuple(params)
    if interpret is None:
        platform = jax.devices()[0].platform
        if (platform not in ("tpu", "axon")
                or env_flag("SE_TPU_DISABLE_PALLAS_ENCODER")):
            return _reference(xc, xm, params)
        interpret = False
    if not interpret:
        _, t, f, c2 = xc.shape
        est = _vmem_estimate(t, f, c2 // 2, params[0].shape[-1] // 2)
        if est > _VMEM_BUDGET:
            _warn_vmem_fallback("encoder_level", est)
            return _reference(xc, xm, params)
    fn = _fused(bool(interpret))
    mesh = active_mesh()
    if mesh is not None:
        mapped = shard_map_leading(fn, mesh, xc.shape[0], n_mapped=2,
                                   n_replicated=len(params))
        if mapped is None:
            return _reference(xc, xm, params)
        return mapped(xc, xm, *params)
    return fn(xc, xm, *params)
