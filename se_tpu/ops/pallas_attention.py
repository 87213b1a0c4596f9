"""Fused scaled-dot-product attention for the Uformer axial attentions.

The T-attention folds to (N=B*F, H=8, L~400, D=16). The XLA einsum path
materializes the (N, H, L, L) energy/softmax tensors in HBM (~660 MB at
batch 32, read+written several times) even though one head's whole
attention fits in VMEM (L*L fp32 ~ 650 KB). This kernel runs
QK^T -> softmax -> AV per (n, h) grid step entirely in VMEM.

Sequence lengths here are short (L <= ~1500 even for 15 s audio), so a
single-pass kernel is simpler and as fast as streaming flash attention;
beyond _VMEM_MAX_L we fall back to the einsum path.

Backward runs through the einsum reference via custom VJP (same pattern as
ops/pallas_lstm.py); numerics match the einsum path to fp32 round-off
(tests/test_pallas_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_MAX_L = 2048  # (L, L) fp32 energy must fit VMEM comfortably
_MIN_L = 64  # below this the einsum path has nothing to lose


def _reference(q, k, v, scale: float):
    e = jnp.einsum("nhld,nhmd->nhlm", q, k) * scale
    p = jax.nn.softmax(e, axis=-1)
    return jnp.einsum("nhlm,nhmd->nhld", p, v)


def _att_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, heads: int):
    # all heads of one n handled per program (unrolled: heads is small)
    for hh in range(heads):
        q = q_ref[0, hh]  # (L, D)
        k = k_ref[0, hh]
        v = v_ref[0, hh]
        e = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        m = jnp.max(e, axis=-1, keepdims=True)
        p = jnp.exp(e - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.dot(p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
        o_ref[0, hh] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _pallas_attention(q, k, v, scale: float, interpret: bool):
    n, h, l, d = q.shape
    kernel = functools.partial(_att_kernel, scale=scale, heads=h)
    spec = pl.BlockSpec((1, h, l, d), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)


@functools.lru_cache(maxsize=8)
def _fused(scale: float, interpret: bool):
    @jax.custom_vjp
    def f(q, k, v):
        return _pallas_attention(q, k, v, scale, interpret)

    def fwd(q, k, v):
        return _pallas_attention(q, k, v, scale, interpret), (q, k, v)

    def bwd(res, g):
        _, vjp = jax.vjp(lambda q, k, v: _reference(q, k, v, scale), *res)
        return vjp(g.astype(res[0].dtype))

    f.defvjp(fwd, bwd)
    return f


def sdp_attention(q, k, v, scale: float, interpret: bool | None = None):
    """(N, H, L, D) scaled-dot-product attention; fused Pallas kernel on
    TPU for VMEM-sized L, einsum elsewhere."""
    from se_tpu.parallel.mesh import active_mesh, shard_map_leading
    from se_tpu.utils.envflags import env_flag

    l = q.shape[2]
    if interpret is None:
        platform = jax.devices()[0].platform
        on_tpu = platform in ("tpu", "axon")
        if not on_tpu or env_flag("SE_TPU_DISABLE_PALLAS_ATTENTION") \
                or l < _MIN_L or l > _VMEM_MAX_L:
            return _reference(q, k, v, scale)
        interpret = False
    mesh = active_mesh()
    fn = _fused(float(scale), bool(interpret))
    if mesh is not None:
        # GSPMD cannot partition pallas_call; run it per-shard with the
        # fold axis split over the whole mesh (attention is independent
        # per (n, h)). Falls back to einsum when the fold doesn't divide.
        mapped = shard_map_leading(fn, mesh, q.shape[0], n_mapped=3)
        if mapped is None:
            return _reference(q, k, v, scale)
        return mapped(q, k, v)
    return fn(q, k, v)
