"""Pallas fused Uformer decoder level (round 3).

One decoder level (ref Uformer/uformer.py:226-231 + fusion) is, per branch:
channel-concat [skip, x] -> stride-(1,2) transposed conv (2,5) -> BN (eval
affine) -> PReLU -> cross-branch fusion. Driven as XLA ops, each level pays
an HBM round trip between every stage and the transposed conv runs at poor
MXU utilization (small channel counts on the lane axis). This kernel runs a
WHOLE level — both branches and the fusion — per batch item in VMEM:

- grid (B,); complex branch channel-concat [re | im] with INTERLEAVED
  weights (see nn/conv.py), so complex math is plain matmuls;
- the transposed conv uses the PHASE-SPLIT formulation (nn/conv.py
  phase_split_tconv_f): even/odd output columns are two in-VMEM im2col
  matmuls over the un-dilated input (even: taps wf[:, 0::2], odd:
  wf[:, 1::2]); the interleave is a free (T, F, 2, C) -> (T, 2F, C)
  non-lane reshape;
- BatchNorm (eval mode) arrives as per-channel scale/shift folded outside
  the kernel; PReLU is the scalar alpha; fusion is fusion.py:13-19.

Backward runs the jnp reference via custom VJP (training uses the composed
module path anyway — this kernel serves the serving path). Numerics match
the composed path to fp32 round-off (tests/test_pallas_decoder.py).

STATUS (round 3): OPT-IN ONLY (SE_TPU_FORCE_PALLAS_DECODER). Measured on
the real chip at B=32 x 4 s, whole-level fusion LOSES to XLA (headline
1813 -> 1127 au-s/s with encoder+decoder kernels on); lane padding limits
it to levels 0-1 (see _vmem_estimate). Kept for the numerics tests and as
a recorded negative result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1.1920929e-07  # np.finfo(np.float32).eps (ref fusion.py EPSILON)


def _tconv_phase_split(x, w_even, w_odd, bias):
    """x (T, F, Cin) -> (T, 2F, Cout) stride-(1,2) transposed conv with
    kernel (2, 5), padding (0, 2), output_padding (0, 1), via phase-split
    per-tap matmul ACCUMULATION (no im2col patch buffer — a (T*F, 6*Cin)
    patch matrix would not fit VMEM at the mid levels). w_even
    (6, Cin, Cout) taps ordered (t-tap major, f-taps [wf0, wf2, wf4]);
    w_odd (4, Cin, Cout) (f-taps [wf1, wf3]); bias (Cout,)."""
    t, f, cin = x.shape
    cout = w_even.shape[-1]
    # T: kh=2 with torch geometry pad (1, 0) — output row t reads padded
    # rows (t, t+1) of xp = pad_top(x, 1), i.e. (x[t-1], x[t])
    xp_t = jnp.pad(x, ((1, 0), (0, 0), (0, 0)))  # (T+1, F, Cin)

    def phase(w_taps, pads, n_taps):
        xf = jnp.pad(xp_t, ((0, 0), pads, (0, 0)))
        acc = jnp.zeros((t * f, cout), jnp.float32)
        for it in range(2):
            for jf in range(n_taps):
                tap = xf[it : it + t, jf : jf + f].reshape(t * f, cin)
                acc += jnp.dot(tap, w_taps[it * n_taps + jf],
                               preferred_element_type=jnp.float32)
        return acc

    # even phase: pad (1, 1), 3 f-taps; odd phase: pad (0, 1), 2 f-taps
    y_even = phase(w_even, (1, 1), 3)
    y_odd = phase(w_odd, (0, 1), 2)
    y = jnp.concatenate(
        [y_even.reshape(t, f, 1, cout), y_odd.reshape(t, f, 1, cout)],
        axis=2,
    ).reshape(t, 2 * f, cout)
    return y + bias


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def _level_math(xc, xm, pc, pm, has_bn: bool):
    """One decoder level on one batch item. xc (T, F, 4C) = channel-concat
    [skip_re | x_re | skip_im | x_im]; xm (T, F, 2C) = [skip_m | m].
    pc = (w_even, w_odd, bias, bn_scale, bn_shift, alpha) for the complex
    branch (cout = 2*C_out interleaved), pm likewise for the real branch
    (cout = C_out)."""
    wc_e, wc_o, bc, sc, tc, ac = pc
    wm_e, wm_o, bm, sm, tm, am = pm
    yc = _tconv_phase_split(xc, wc_e, wc_o, bc)
    ym = _tconv_phase_split(xm, wm_e, wm_o, bm)
    if has_bn:
        yc = _prelu(yc * sc + tc, ac)
        ym = _prelu(ym * sm + tm, am)
    c = yc.shape[-1] // 2
    re, im = yc[..., :c], yc[..., c:]
    cplx_mag = jnp.sqrt(jnp.maximum(re * re + im * im, _EPS))
    mag_out = ym + jax.nn.sigmoid(cplx_mag)
    s = jax.nn.sigmoid(ym)
    return jnp.concatenate([re + s, im + s], axis=-1), mag_out


def _kernel(xc_ref, xm_ref, *refs, has_bn: bool):
    oc_ref, om_ref = refs[-2], refs[-1]
    vals = [r[:] for r in refs[:-2]]
    def unpack(v):
        w_e, w_o, b, s, t, a = v
        # Mosaic can only squeeze 32-bit scalars: cast a before [0, 0]
        return (w_e, w_o, b[0], s[0], t[0], a.astype(jnp.float32)[0, 0])
    pc = unpack(vals[:6])
    pm = unpack(vals[6:12])
    yc, ym = _level_math(xc_ref[0].astype(jnp.float32),
                         xm_ref[0].astype(jnp.float32), pc, pm, has_bn)
    oc_ref[0] = yc.astype(oc_ref.dtype)
    om_ref[0] = ym.astype(om_ref.dtype)


@functools.partial(jax.jit, static_argnames=("has_bn", "interpret"))
def _pallas_level(xc, xm, params, has_bn: bool, interpret: bool):
    b, t, f, _ = xc.shape
    cout_c = params[0].shape[-1]
    cout_m = params[6].shape[-1]
    kernel = functools.partial(_kernel, has_bn=has_bn)
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM)
    item = lambda ch, ff: pl.BlockSpec((1, t, ff, ch),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[item(xc.shape[-1], f), item(xm.shape[-1], f)]
        + [full(p) for p in params],
        out_specs=[item(cout_c, 2 * f), item(cout_m, 2 * f)],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, 2 * f, cout_c), xc.dtype),
            jax.ShapeDtypeStruct((b, t, 2 * f, cout_m), xm.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xc, xm, *params)


def _unpack_ref(params):
    def unpack(v):
        w_e, w_o, b, s, t, a = v
        return (w_e, w_o, b[0], s[0], t[0], a[0, 0])
    return unpack(params[:6]), unpack(params[6:12])


def _reference(xc, xm, params, has_bn: bool):
    pc, pm = _unpack_ref(params)
    yc, ym = jax.vmap(
        lambda a, b: _level_math(a.astype(jnp.float32),
                                 b.astype(jnp.float32), pc, pm, has_bn)
    )(xc, xm)
    return yc.astype(xc.dtype), ym.astype(xm.dtype)


@functools.lru_cache(maxsize=16)
def _fused(has_bn: bool, interpret: bool):
    @jax.custom_vjp
    def f(xc, xm, *params):
        return _pallas_level(xc, xm, params, has_bn, interpret)

    def fwd(xc, xm, *params):
        return _pallas_level(xc, xm, params, has_bn, interpret), \
            (xc, xm) + params

    def bwd(res, g):
        _, vjp = jax.vjp(
            lambda xc, xm, *p: _reference(xc, xm, p, has_bn), *res)
        gc, gm = g
        return vjp((gc.astype(res[0].dtype), gm.astype(res[1].dtype)))

    f.defvjp(fwd, bwd)
    return f


def split_phase_weights(kernel: jnp.ndarray):
    """(2, 5, Cin, Cout) unflipped tconv kernel -> (w_even (6, Cin, Cout),
    w_odd (4, Cin, Cout)) per-tap phase weights, tap order (t-tap major,
    f-tap) matching _tconv_phase_split.

    Derivation (nn/conv.py phase_split_tconv_f with kw=5, pw=2, opw=1):
    with wf = flip(kernel), even-phase f-taps are [wf0, wf2, wf4] over
    x[q-1..q+1] and odd-phase f-taps [wf1, wf3] over x[q..q+1]."""
    wf = jnp.flip(kernel, axis=(0, 1))  # (2, 5, Cin, Cout)
    cin, cout = kernel.shape[2], kernel.shape[3]
    w_even = wf[:, 0::2].reshape(2 * 3, cin, cout)
    w_odd = wf[:, 1::2].reshape(2 * 2, cin, cout)
    return w_even, w_odd


def _vmem_estimate(t: int, f: int, cxc: int, cxm: int, cout: int) -> int:
    """Padded-VMEM bytes for one grid step (fp32). Same tiling model as
    pallas_encoder._vmem_estimate: (8, 128) tiles on the last two dims,
    double-buffered in/out windows, the causal-pad and two phase-pad views
    per branch, and the accumulators/tap buffers. Calibrated on-chip at
    T=401: decoder level 1 (F=8, c_comp=256) estimates ~102 MB and
    compiles; level 2 (F=16, c_comp=96) estimates ~112 MB and OOMs at an
    actual 167 MB of 128 MB — the estimator misses Mosaic's per-tap copies
    of the F-padded views, hence the conservative budget."""
    ru = lambda x, m: -(-x // m) * m
    lane = lambda c: ru(max(c, 1), 128)
    b = 2 * t * ru(f, 8) * (lane(cxc) + lane(cxm)) * 4
    b += 2 * t * ru(2 * f, 8) * (lane(2 * cout) + lane(cout)) * 4
    b += (t + 1) * ru(f, 8) * (lane(cxc) + lane(cxm)) * 4
    b += (t + 1) * ru(f + 2, 8) * (lane(cxc) + lane(cxm)) * 4
    b += (t + 1) * ru(f + 1, 8) * (lane(cxc) + lane(cxm)) * 4
    b += t * f * (2 * lane(2 * cout) + 2 * lane(cout) + 2 * lane(cxc)) * 4
    return b


_VMEM_BUDGET = 105 * 1024 * 1024


def decoder_level(xc, xm, params, has_bn: bool,
                  interpret: bool | None = None):
    """xc (B, T, F, 4C) channel-concat [skip_re | x_re | skip_im | x_im],
    xm (B, T, F, 2C) [skip_m | m] -> ((B, T, 2F, 2*C_out), (B, T, 2F,
    C_out)). `params` is the 12-tuple (complex then real branch, each
    (w_even, w_odd, bias (1, Cout), bn_scale (1, Cout), bn_shift (1,
    Cout), alpha (1, 1)))."""
    from se_tpu.parallel.mesh import active_mesh, shard_map_leading
    from se_tpu.utils.envflags import env_flag

    params = tuple(params)
    if interpret is None:
        platform = jax.devices()[0].platform
        if (platform not in ("tpu", "axon")
                or env_flag("SE_TPU_DISABLE_PALLAS_DECODER")):
            return _reference(xc, xm, params, has_bn)
        interpret = False
    if not interpret:
        _, t, f, c4 = xc.shape
        est = _vmem_estimate(t, f, c4, xm.shape[-1],
                             params[2].shape[-1] // 2)
        if est > _VMEM_BUDGET:
            from se_tpu.ops.pallas_encoder import _warn_vmem_fallback

            _warn_vmem_fallback("decoder_level", est, _VMEM_BUDGET)
            return _reference(xc, xm, params, has_bn)
    fn = _fused(has_bn, bool(interpret))
    mesh = active_mesh()
    if mesh is not None:
        mapped = shard_map_leading(fn, mesh, xc.shape[0], n_mapped=2,
                                   n_replicated=len(params))
        if mapped is None:
            return _reference(xc, xm, params, has_bn)
        return mapped(xc, xm, *params)
    return fn(xc, xm, *params)
