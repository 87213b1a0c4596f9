"""Uformer: dilated dual-path complex/real conformer U-net, waveform in/out
(ref: Uformer/uformer.py:30-304).

Dual-branch U-net: a complex branch (full-channel complex convs carrying
(re, im) pairs — ref conv2d_cplx.py:11-68) and a magnitude branch
(conv2d_real.py), 6 levels each (channels 1->8->16->32->64->128->128), with
encoder/decoder cross-branch fusion after every level (ref fusion.py:13-19:
mag += sigmoid(|cplx|), cplx += sigmoid(mag)). Bottleneck =
Dilated_Dualpath_Conformer (ref dilated_dualpath_conformer.py:23-78):
FF -> T-attention -> F-attention -> 8 dilated DSConv blocks (dilations 1..128
paired with reversed) -> FF -> LayerNorm, fusing branches after every step.
Complex attention combines 8 real attentions as (A-B-C-D, E+F+G-H)
(ref t_att_cplx.py:54-70). Output: sigmoid mag-mask and E-style complex mask
averaged (ref uformer.py:236-262); STFT/iSTFT in-graph.

TPU notes: our NHWC layout (B, T, F, C) makes every torch transpose-for-
LayerNorm a no-op, and the T/F attention folds are pure reshapes. The in-graph
DFT rides se_tpu.ops.stft (matmul basis, MXU).

Quirks preserved: EPSILON added inside atan2/tanh args, residuals scaled by
0.5 in the FF blocks, decoder concatenates [skip, x] (skip first).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from se_tpu.nn import BatchNorm, Conv2d, ConvTranspose2d, LayerNorm
from se_tpu.nn.conv import (
    ConvParams,
    interleave_complex_bias,
    interleave_complex_kernel,
)
from se_tpu.nn.activations import PReLU
from se_tpu.nn.complex_ops import ComplexDense
from se_tpu.ops.pallas_attention import sdp_attention
from se_tpu.ops.stft import PRESET_UFORMER, istft, stft
from se_tpu.parallel.mesh import shard_activation
from se_tpu.models.registry import ModelEntry, register
from se_tpu.utils import torch_compat as tc
from se_tpu.utils.envflags import env_flag

EPS = float(np.finfo(np.float32).eps)
KERNELS = (1, 8, 16, 32, 64, 128, 128)
DILATIONS = (1, 2, 4, 8, 16, 32, 64, 128)


class CConvEnc(nn.Module):
    """Uformer complex conv: FULL-channel shared real/imag convs
    (ref conv2d_cplx.py:11-38). kernel (kt=2, kf=5), causal T, sym F.

    TPU: ONE interleaved conv dispatch on channel-concat [re | im] with the
    block kernel [[Wr, Wi], [-Wi, Wr]] — same FLOPs as the 4 logical convs,
    1 dispatch instead of 2-4, and doubled K/N dims for the MXU. Param tree
    identical to two Conv2d children (checkpoint/parity compatible)."""

    features: int
    kernel: tuple[int, int] = (2, 5)
    strides: tuple[int, int] = (1, 2)
    padding: tuple = ((1, 0), (2, 2))
    dilation: tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, re, im):
        kh, kw = self.kernel
        cin = re.shape[-1]
        kshape = (kh, kw, cin, self.features)
        kr, br = ConvParams(kshape, name="real_conv")()
        ki, bi = ConvParams(kshape, name="imag_conv")()
        w = interleave_complex_kernel(kr, ki)
        x = jnp.concatenate([re, im], axis=-1)
        out = lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=tuple(self.strides),
            padding=tuple(tuple(p) for p in self.padding),
            rhs_dilation=tuple(self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = out + interleave_complex_bias(br, bi).astype(out.dtype)
        return out[..., : self.features], out[..., self.features :]


class CConvDec(nn.Module):
    """Interleaved complex transposed conv (geometry of ConvTranspose2d with
    padding (0, 2), output_padding (0, 1)); see CConvEnc."""

    features: int
    kernel: tuple[int, int] = (2, 5)
    strides: tuple[int, int] = (1, 2)

    @nn.compact
    def __call__(self, re, im):
        t_in = re.shape[1]
        kh, kw = self.kernel
        sh, sw = self.strides
        ph, pw = 0, 2
        oph, opw = 0, 1
        cin = re.shape[-1]
        kshape = (kh, kw, cin, self.features)
        kr, br = ConvParams(kshape, transpose=True, name="real_conv")()
        ki, bi = ConvParams(kshape, transpose=True, name="imag_conv")()
        w_unflipped = interleave_complex_kernel(kr, ki)
        x = jnp.concatenate([re, im], axis=-1)
        from se_tpu.nn.conv import phase_split_tconv_f
        from se_tpu.utils.envflags import env_flag

        out = None
        if (sh, sw) == (1, 2) and not env_flag("SE_TPU_DISABLE_PHASE_SPLIT"):
            # phase-split stride-2-over-F transposed conv (see nn/conv.py)
            out = phase_split_tconv_f(x, w_unflipped.astype(x.dtype),
                                      ph, pw, oph, opw)
        if out is None:
            w = jnp.flip(w_unflipped, axis=(0, 1))
            out = lax.conv_general_dilated(
                x, w.astype(x.dtype),
                window_strides=(1, 1),
                padding=[(kh - 1 - ph, kh - 1 - ph + oph),
                         (kw - 1 - pw, kw - 1 - pw + opw)],
                lhs_dilation=(sh, sw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = out + interleave_complex_bias(br, bi).astype(out.dtype)
        return (out[:, :t_in, :, : self.features],
                out[:, :t_in, :, self.features :])


class RConvEnc(nn.Module):
    features: int
    kernel: tuple[int, int] = (2, 5)
    strides: tuple[int, int] = (1, 2)
    padding: tuple = ((1, 0), (2, 2))
    dilation: tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        return Conv2d(self.features, self.kernel, self.strides,
                      padding=self.padding, dilation=self.dilation,
                      name="conv")(x)


class RConvDec(nn.Module):
    features: int
    kernel: tuple[int, int] = (2, 5)
    strides: tuple[int, int] = (1, 2)

    @nn.compact
    def __call__(self, x):
        t_in = x.shape[1]
        return ConvTranspose2d(self.features, self.kernel, self.strides,
                               padding=(0, 2), output_padding=(0, 1),
                               name="conv")(x)[:, :t_in]


def fusion(re, im, mag):
    """Cross-branch coupling (ref fusion.py:13-19)."""
    cplx_mag = jnp.sqrt(jnp.maximum(re**2 + im**2, EPS))
    mag_out = mag + nn.sigmoid(cplx_mag)
    s = nn.sigmoid(mag)
    return re + s, im + s, mag_out


class ComplexBN(nn.Module):
    """torch BatchNorm3d on (N,C,F,T,2): shared per-channel stats over re+im."""

    @nn.compact
    def __call__(self, re, im, train: bool = False):
        stacked = jnp.stack([re, im], axis=1)  # (B, 2, T, F, C)
        out = BatchNorm(name="bn3d")(stacked, use_running_average=not train)
        return out[:, 0], out[:, 1]


class FFCplx(nn.Module):
    """(ref ff_cplx.py:10-33); LN and PReLU shared across re/im."""

    hidden: int = 64

    @nn.compact
    def __call__(self, re, im, deterministic: bool = True):
        ln = LayerNorm(name="ln")
        act = PReLU(None, name="prelu")
        drop = nn.Dropout(0.1, deterministic=deterministic)
        yr, yi = ln(re), ln(im)
        yr, yi = ComplexDense(self.hidden, name="linear1")(yr, yi)
        yr, yi = act(yr), act(yi)
        yr, yi = drop(yr), drop(yi)
        yr, yi = ComplexDense(re.shape[-1], name="linear2")(yr, yi)
        yr, yi = drop(yr), drop(yi)
        return yr * 0.5 + re, yi * 0.5 + im


class FFReal(nn.Module):
    hidden: int = 64

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = LayerNorm(name="ln")(x)
        y = nn.Dense(self.hidden, name="linear1")(y)
        y = PReLU(None, name="prelu")(y)
        y = nn.Dropout(0.1, deterministic=deterministic)(y)
        y = nn.Dense(x.shape[-1], name="linear2")(y)
        y = nn.Dropout(0.1, deterministic=deterministic)(y)
        return y * 0.5 + x


class SingleAtt(nn.Module):
    """One scaled-dot attention over the middle axis of (N, L, C)
    (ref t_att_cplx.py T_att:15-37)."""

    hidden: int = 16

    @nn.compact
    def __call__(self, q, k, v):
        q = nn.Dense(self.hidden, name="query")(q)
        k = nn.Dense(self.hidden, name="key")(k)
        v = nn.Dense(self.hidden, name="value")(v)
        out = sdp_attention(q[:, None], k[:, None], v[:, None],
                            1.0 / np.sqrt(self.hidden))
        return out[:, 0]


class SingleAttProj(nn.Module):
    """The q/k/v projections of one SingleAtt, without the attention core.
    Same param tree as SingleAtt so reference weight conversion is shared."""

    hidden: int = 16

    @nn.compact
    def __call__(self, q, k, v):
        return (nn.Dense(self.hidden, name="query")(q),
                nn.Dense(self.hidden, name="key")(k),
                nn.Dense(self.hidden, name="value")(v))


class ComplexSelfAtt(nn.Module):
    """8 real attentions combined as (A-B-C-D, E+F+G-H)
    (ref t_att_cplx.py:40-70).

    TPU: the 8 attentions run as ONE batched 8-head attention — per-head q/k/v
    projections (tiny C->16 matmuls, param tree identical to 8 SingleAtts) are
    stacked onto a head axis so the L x M energy/softmax/apply, the hot part,
    is a single fused dispatch instead of 8 small ones."""

    hidden: int = 16

    @nn.compact
    def __call__(self, re, im):
        ln1 = LayerNorm(name="ln1")
        r, i = ln1(re), ln1(im)
        # (q, k, v) input selection per head, ref t_att_cplx.py:54-61
        inputs = ((r, r, r), (r, i, i), (i, r, i), (i, i, r),
                  (r, r, i), (r, i, r), (i, r, r), (i, i, i))
        qs, ks, vs = [], [], []
        for idx, (q_in, k_in, v_in) in enumerate(inputs):
            q, k, v = SingleAttProj(self.hidden, name=f"att{idx + 1}")(
                q_in, k_in, v_in)
            qs.append(q)
            ks.append(k)
            vs.append(v)
        q = jnp.stack(qs, axis=1)  # (N, 8, L, D)
        k = jnp.stack(ks, axis=1)
        v = jnp.stack(vs, axis=1)
        out = sdp_attention(q, k, v, 1.0 / np.sqrt(self.hidden))
        a, b, c, d, e, f, g, h = (out[:, j] for j in range(8))
        out_r, out_i = a - b - c - d, e + f + g - h
        ln2 = LayerNorm(name="ln2")
        return ln2(out_r), ln2(out_i)


class ComplexAxialAtt(nn.Module):
    """Axial attention branch over T (axis="t") or F (axis="f")
    (ref t_att_cplx.py:73-96, f_att_cplx.py:66-88)."""

    axis: str
    hidden: int = 16

    @nn.compact
    def __call__(self, re, im, deterministic: bool = True):
        b, t, f, c = re.shape

        def fold(x):
            if self.axis == "t":
                return jnp.swapaxes(x, 1, 2).reshape(b * f, t, c)
            return x.reshape(b * t, f, c)

        def unfold(x):
            if self.axis == "t":
                return jnp.swapaxes(x.reshape(b, f, t, c), 1, 2)
            return x.reshape(b, t, f, c)

        # Sequence-parallel: the T-attention fold puts F on the batch dim
        # and the F-attention fold puts T there — shard it over 'model'
        # when a mesh is active (ref SURVEY.md §2.5 consequence (2)).
        fr = shard_activation(fold(re), "model", None, None)
        fi = shard_activation(fold(im), "model", None, None)
        r, i = ComplexSelfAtt(self.hidden, name="att")(fr, fi)
        r, i = ComplexDense(c, name="transform")(r, i)
        r, i = unfold(r), unfold(i)
        ln3 = LayerNorm(name="ln3")
        act = PReLU(None, name="prelu")
        drop = nn.Dropout(0.1, deterministic=deterministic)
        r, i = drop(act(ln3(r))), drop(act(ln3(i)))
        return r + re, i + im


class RealAxialAtt(nn.Module):
    axis: str
    hidden: int = 16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, t, f, c = x.shape

        def fold(y):
            if self.axis == "t":
                return jnp.swapaxes(y, 1, 2).reshape(b * f, t, c)
            return y.reshape(b * t, f, c)

        def unfold(y):
            if self.axis == "t":
                return jnp.swapaxes(y.reshape(b, f, t, c), 1, 2)
            return y.reshape(b, t, f, c)

        h = shard_activation(fold(x), "model", None, None)
        h = LayerNorm(name="ln1")(h)
        h = SingleAtt(self.hidden, name="att")(h, h, h)
        h = LayerNorm(name="ln2")(h)
        h = nn.Dense(c, name="transform")(h)
        h = unfold(h)
        h = PReLU(None, name="prelu")(LayerNorm(name="ln3")(h))
        h = nn.Dropout(0.1, deterministic=deterministic)(h)
        return h + x


class _LNParams(nn.Module):
    """LayerNorm parameter holder (tree-compatible with nn/norms.LayerNorm)."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class _PReLUParams(nn.Module):
    """Scalar PReLU parameter holder (tree-compatible with PReLU)."""

    @nn.compact
    def __call__(self):
        return self.param("weight", lambda k, s: jnp.full(s, 0.25), ())


class _CConvWeights(nn.Module):
    """Interleaved complex conv weights with CConvEnc's param tree."""

    kshape: tuple[int, int, int, int]
    transpose: bool = False

    @nn.compact
    def __call__(self):
        kr, br = ConvParams(self.kshape, transpose=self.transpose,
                            name="real_conv")()
        ki, bi = ConvParams(self.kshape, transpose=self.transpose,
                            name="imag_conv")()
        return (interleave_complex_kernel(kr, ki),
                interleave_complex_bias(br, bi))


class _RConvWeights(nn.Module):
    """Plain conv weights with RConvEnc's param tree."""

    kshape: tuple[int, int, int, int]
    transpose: bool = False

    @nn.compact
    def __call__(self):
        return ConvParams(self.kshape, transpose=self.transpose,
                          name="conv")()


class _BNAffine(nn.Module):
    """Eval-mode BatchNorm folded to per-channel (scale, shift); tree
    identical to flax nn.BatchNorm (params scale/bias, batch_stats
    mean/var) so checkpoints and reference conversions are unchanged."""

    ch: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.ch,))
        bias = self.param("bias", nn.initializers.zeros, (self.ch,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.ch,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.ch,), jnp.float32))
        inv = lax.rsqrt(var.value + self.eps) * scale
        return inv, bias - mean.value * inv


class _BNWrap(nn.Module):
    """BatchNorm(name='bn') wrapper tree (nn/norms.BatchNorm)."""

    ch: int

    @nn.compact
    def __call__(self):
        return _BNAffine(self.ch, name="bn")()


class _ComplexBNAffine(nn.Module):
    """ComplexBN(name='bn3d') wrapper tree (shared re/im stats)."""

    ch: int

    @nn.compact
    def __call__(self):
        return _BNWrap(self.ch, name="bn3d")()


def _dsconv_params(self, c_in: int, cc: int, ncomp: int):
    """Assemble the fused-kernel 13-tuple from the module's param tree
    (identical tree to the composed CConvEnc/RConvEnc implementation, so
    reference weight conversion is unchanged)."""
    holder = _CConvWeights if ncomp == 2 else _RConvWeights
    g1, b1 = _LNParams(c_in, name="ln1")()
    w1, bb1 = holder((1, 1, c_in, cc), name="conv1x1")()
    alpha = _PReLUParams(name="prelu")()
    wd1, bd1 = holder((3, 3, cc, cc), name="dconv1")()
    wd2, bd2 = holder((3, 3, cc, cc), name="dconv2")()
    g2, b2 = _LNParams(cc, name="ln2")()
    ws, bs = holder((1, 1, cc, c_in), name="sconv")()
    tot = ncomp * cc
    # per-component LN params are shared across components: tile them to
    # the channel-concat width so the kernel sees full-width vectors
    return (jnp.tile(g1, ncomp)[None], jnp.tile(b1, ncomp)[None],
            w1.reshape(ncomp * c_in, tot), bb1[None],
            alpha[None, None],
            wd1.reshape(9 * tot, tot), bd1[None],
            wd2.reshape(9 * tot, tot), bd2[None],
            jnp.tile(g2, ncomp)[None], jnp.tile(b2, ncomp)[None],
            ws.reshape(tot, ncomp * c_in), bs[None])


class _DSConvParamsHolder(nn.Module):
    """Creates exactly the param tree of DSConvCplx/DSConvReal (same child
    module names via _dsconv_params) without running the block — the fused
    pair kernel consumes both branches' params in one dispatch."""

    conv_channels: int
    ncomp: int

    @nn.compact
    def __call__(self, c_in: int):
        return _dsconv_params(self, c_in, self.conv_channels, self.ncomp)


class DSConvCplx(nn.Module):
    """Gated dilated DSConv block (ref dsconv2d_cplx.py:11-60). Dilation on
    T, symmetric padding (non-causal), per-component gating.

    TPU: the whole block (2 LNs, 5 logical convs as interleaved matmuls,
    both gates, residual) runs as ONE Pallas kernel per batch item in VMEM
    (se_tpu/ops/pallas_dsconv.py). Train mode (dropout active) uses the
    jnp reference path so dropout lands between sconv and the residual."""

    conv_channels: int = 32
    dilation1: int = 1
    dilation2: int = 1

    @nn.compact
    def __call__(self, re, im, deterministic: bool = True):
        from se_tpu.ops.pallas_dsconv import _reference, dsconv_block

        c_in = re.shape[-1]
        params = _dsconv_params(self, c_in, self.conv_channels, ncomp=2)
        x = jnp.concatenate([re, im], axis=-1)
        if deterministic:
            out = dsconv_block(x, params, self.dilation1, self.dilation2,
                               ncomp=2)
        else:
            # block-granular checkpoint: without it the 16-block conformer
            # backward compiles into one giant graph the TPU compiler
            # handles pathologically (round 4: 16.3 s/step at B=8 x 4 s,
            # bisected to the dsconv param grads; the whole-forward remat
            # variant crashed the remote compiler outright).
            # SE_TPU_DISABLE_BLOCK_CKPT=1 ablates it (VERDICT r4 item 3).
            fn = lambda x, p: _reference(x, p, self.dilation1,
                                         self.dilation2, 2)
            if not env_flag("SE_TPU_DISABLE_BLOCK_CKPT"):
                fn = jax.checkpoint(fn)
            ref = fn(x, params)
            delta = ref - x  # the block's pre-residual output, exactly
            out = x + nn.Dropout(0.1, deterministic=False)(delta)
        return out[..., :c_in], out[..., c_in:]


class DSConvReal(nn.Module):
    conv_channels: int = 32
    dilation1: int = 1
    dilation2: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from se_tpu.ops.pallas_dsconv import _reference, dsconv_block

        c_in = x.shape[-1]
        params = _dsconv_params(self, c_in, self.conv_channels, ncomp=1)
        if deterministic:
            return dsconv_block(x, params, self.dilation1, self.dilation2,
                                ncomp=1)
        fn = lambda x, p: _reference(x, p, self.dilation1,
                                     self.dilation2, 1)
        if not env_flag("SE_TPU_DISABLE_BLOCK_CKPT"):
            fn = jax.checkpoint(fn)
        return x + nn.Dropout(0.1, deterministic=False)(fn(x, params) - x)


class DilatedDualpathConformer(nn.Module):
    """(ref dilated_dualpath_conformer.py:23-78)."""

    @nn.compact
    def __call__(self, re, im, mag, deterministic: bool = True):
        re, im = FFCplx(name="ff1_cplx")(re, im, deterministic)
        mag = FFReal(name="ff1_mag")(mag, deterministic)
        re, im, mag = fusion(re, im, mag)

        re, im = ComplexAxialAtt("t", name="cplx_tatt")(re, im, deterministic)
        mag = RealAxialAtt("t", name="mag_tatt")(mag, deterministic)
        re, im, mag = fusion(re, im, mag)

        re, im = ComplexAxialAtt("f", name="cplx_fatt")(re, im, deterministic)
        mag = RealAxialAtt("f", name="mag_fatt")(mag, deterministic)
        re, im, mag = fusion(re, im, mag)

        import jax

        from se_tpu.utils.envflags import env_flag

        # dsconv_pair_block is the fused single-dispatch entry; since the
        # round-3 A/B (PERF.md "Negative results": pair kernel 1814 vs 1916
        # composed) the Pallas path inside it is opt-in via
        # SE_TPU_FORCE_PALLAS_DSCONV, so without the force flag this branch
        # routes to _pair_reference — the same composed lax.conv math as the
        # module path below, with an identical param tree. The TPU-only
        # guard is kept so CPU (tests, init) always uses the module path.
        platform = jax.devices()[0].platform
        use_pair = (platform in ("tpu", "axon")
                    and not env_flag("SE_TPU_DISABLE_PALLAS_DSCONV")
                    and not env_flag("SE_TPU_DISABLE_PALLAS_DSCONV_PAIR"))
        n = len(DILATIONS)
        for idx, d in enumerate(DILATIONS):
            d2 = DILATIONS[n - idx - 1]
            if deterministic and use_pair:
                # fused stage: cplx block + real block + fusion in ONE
                # pallas dispatch (se_tpu/ops/pallas_dsconv.py); param
                # tree identical to the composed modules below
                from se_tpu.ops.pallas_dsconv import dsconv_pair_block

                c_in = re.shape[-1]
                pc = _DSConvParamsHolder(32, 2,
                                         name=f"dsconv_cplx{idx}")(c_in)
                pm = _DSConvParamsHolder(32, 1,
                                         name=f"dsconv_real{idx}")(
                    mag.shape[-1])
                xc = jnp.concatenate([re, im], axis=-1)
                yc, mag = dsconv_pair_block(xc, mag, pc, pm, d, d2)
                re, im = yc[..., :c_in], yc[..., c_in:]
            else:
                re, im = DSConvCplx(32, d, d2, name=f"dsconv_cplx{idx}")(
                    re, im, deterministic)
                mag = DSConvReal(32, d, d2, name=f"dsconv_real{idx}")(
                    mag, deterministic)
                re, im, mag = fusion(re, im, mag)

        re, im = FFCplx(name="ff2_cplx")(re, im, deterministic)
        mag = FFReal(name="ff2_mag")(mag, deterministic)
        re, im, mag = fusion(re, im, mag)

        ln_c = LayerNorm(name="ln_conformer_cplx")
        re, im = ln_c(re), ln_c(im)
        mag = LayerNorm(name="ln_conformer_mag")(mag)
        return re, im, mag


class Uformer(nn.Module):
    """Waveform -> (est_wav, src_wav_rt, est_cplx(re,im), src_cplx(re,im)).

    `compressed=True` applies the mag**0.5 regime inside the graph (the cprs
    training variant: ref uformer.py:190,201 commented pairs + decode usage).
    """

    compressed: bool = False

    @nn.compact
    def __call__(self, noisy, src, train: bool = False):
        cfg = PRESET_UFORMER
        deterministic = not train
        n_re, n_im = stft(noisy, cfg)  # (B, T, F)
        s_re, s_im = stft(src, cfg)
        t_frames = n_re.shape[1]
        out_len = (t_frames - 1) * cfg.hop
        src_rt = istft(s_re, s_im, cfg, length=out_len)

        # cos/sin of atan2(b + EPS, a) computed algebraically as
        # (a, b + EPS) / hypot — no transcendentals; same values as the
        # reference's cos(atan2)/sin(atan2) chains to fp32 round-off
        # (ref uformer.py:185-205; the VPU trig chain costs ~10x a rsqrt)
        def unit_phase(a, b):
            bb = b + EPS
            inv = lax.rsqrt(a * a + bb * bb)
            return a * inv, bb * inv

        s_mag = jnp.sqrt(jnp.maximum(s_re**2 + s_im**2, EPS))
        s_cos, s_sin = unit_phase(s_re, s_im)
        if self.compressed:
            s_mag = s_mag**0.5
        src_cplx = (s_mag * s_cos, s_mag * s_sin)

        mag_full = jnp.sqrt(jnp.maximum(n_re**2 + n_im**2, EPS))
        cos_p, sin_p = unit_phase(n_re, n_im)
        if self.compressed:
            mag_full = mag_full**0.5
        re = (mag_full * cos_p)[..., 1:, None]  # strip DC, add C
        im = (mag_full * sin_p)[..., 1:, None]
        mag = mag_full[..., 1:, None]

        import jax as _jax

        from se_tpu.utils.envflags import env_flag as _env_flag

        # fused encoder levels (ops/pallas_encoder.py): conv + BN + PReLU +
        # fusion for both branches in ONE dispatch per level. OPT-IN ONLY:
        # measured on-chip (round 3, B=32 x 4 s) the per-batch-item grid
        # loses to XLA's conv emitter — headline 1813 -> 1127 au-s/s with
        # encoder+decoder level kernels on (PERF.md "Negative results").
        use_enc_kernel = (
            deterministic
            and _env_flag("SE_TPU_FORCE_PALLAS_ENCODER")
            and not _env_flag("SE_TPU_DISABLE_PALLAS_ENCODER"))
        skips_c, skips_m = [], []
        for i in range(6):
            if use_enc_kernel:
                from se_tpu.ops.pallas_encoder import encoder_level

                cin = re.shape[-1]
                cout = KERNELS[i + 1]
                wc, bc = _CConvWeights((2, 5, cin, cout),
                                       name=f"enc{i}")()
                wm, bm = _RConvWeights((2, 5, cin, cout),
                                       name=f"enc_real{i}")()
                invc, shc = _ComplexBNAffine(cout, name=f"enc_bn{i}")()
                invm, shm = _BNWrap(cout, name=f"enc_real_bn{i}")()
                ac = _PReLUParams(name=f"enc_act{i}")()
                am = _PReLUParams(name=f"enc_real_act{i}")()
                xc = jnp.concatenate([re, im], axis=-1)
                pc = (wc, bc[None], jnp.tile(invc, 2)[None],
                      jnp.tile(shc, 2)[None], ac[None, None])
                pm = (wm, bm[None], invm[None], shm[None],
                      am[None, None])
                yc, mag = encoder_level(xc, mag, pc + pm)
                re, im = yc[..., :cout], yc[..., cout:]
            else:
                re, im = CConvEnc(KERNELS[i + 1], name=f"enc{i}")(re, im)
                re, im = ComplexBN(name=f"enc_bn{i}")(re, im, train=train)
                act = PReLU(None, name=f"enc_act{i}")
                re, im = act(re), act(im)
                mag = RConvEnc(KERNELS[i + 1], name=f"enc_real{i}")(mag)
                mag = BatchNorm(name=f"enc_real_bn{i}")(mag, use_running_average=not train)
                mag = PReLU(None, name=f"enc_real_act{i}")(mag)
                re, im, mag = fusion(re, im, mag)
            skips_c.append((re, im))
            skips_m.append(mag)

        re, im, mag = DilatedDualpathConformer(name="conformer")(
            re, im, mag, deterministic)

        import jax as _jax

        from se_tpu.utils.envflags import env_flag as _env_flag

        # fused decoder levels: skip-concat + phase-split transposed conv +
        # BN + PReLU + fusion as ONE Pallas dispatch per level
        # (ops/pallas_decoder.py). OPT-IN ONLY — measured slower than the
        # XLA path on-chip (see the encoder-kernel note above).
        use_dec_kernel = (
            deterministic
            and _env_flag("SE_TPU_FORCE_PALLAS_DECODER")
            and not _env_flag("SE_TPU_DISABLE_PALLAS_DECODER"))
        for i in range(6):
            skip_re, skip_im = skips_c[-1 - i]
            if use_dec_kernel and i < 5:
                from se_tpu.ops.pallas_decoder import (
                    decoder_level, split_phase_weights,
                )

                c_comp = skip_re.shape[-1] + re.shape[-1]
                cout = KERNELS[5 - i]
                wc, bc = _CConvWeights((2, 5, c_comp, cout),
                                       transpose=True, name=f"dec{i}")()
                wce, wco = split_phase_weights(wc)
                wm, bm = _RConvWeights((2, 5, c_comp, cout),
                                       transpose=True,
                                       name=f"dec_real{i}")()
                wme, wmo = split_phase_weights(wm)
                invc, shc = _ComplexBNAffine(cout, name=f"dec_bn{i}")()
                invm, shm = _BNWrap(cout, name=f"dec_real_bn{i}")()
                ac = _PReLUParams(name=f"dec_act{i}")()
                am = _PReLUParams(name=f"dec_real_act{i}")()
                xc = jnp.concatenate([skip_re, re, skip_im, im], axis=-1)
                xm = jnp.concatenate([skips_m[-1 - i], mag], axis=-1)
                pc = (wce, wco, bc[None], jnp.tile(invc, 2)[None],
                      jnp.tile(shc, 2)[None], ac[None, None])
                pm = (wme, wmo, bm[None], invm[None], shm[None],
                      am[None, None])
                yc, mag = decoder_level(xc, xm, pc + pm, has_bn=True)
                re, im = yc[..., :cout], yc[..., cout:]
                continue
            # decoder cat order: [skip, x] (ref uformer.py:226-231)
            re = jnp.concatenate([skip_re, re], axis=-1)
            im = jnp.concatenate([skip_im, im], axis=-1)
            re, im = CConvDec(KERNELS[5 - i], name=f"dec{i}")(re, im)
            mag = jnp.concatenate([skips_m[-1 - i], mag], axis=-1)
            mag = RConvDec(KERNELS[5 - i], name=f"dec_real{i}")(mag)
            if i < 5:
                re, im = ComplexBN(name=f"dec_bn{i}")(re, im, train=train)
                act = PReLU(None, name=f"dec_act{i}")
                re, im = act(re), act(im)
                mag = BatchNorm(name=f"dec_real_bn{i}")(mag, use_running_average=not train)
                mag = PReLU(None, name=f"dec_real_act{i}")(mag)
            re, im, mag = fusion(re, im, mag)

        # heads (ref uformer.py:236-262); channel dim is 1 -> drop it
        mag = nn.sigmoid(mag[..., 0])
        mag = jnp.pad(mag, ((0, 0), (0, 0), (1, 0)))  # re-pad DC
        mag = mag * mag_full

        mask_re, mask_im = re[..., 0], im[..., 0]
        mask_mags = jnp.sqrt(jnp.maximum(mask_re**2 + mask_im**2, EPS))
        real_phase = mask_re / (mask_mags + EPS)
        imag_phase = mask_im / (mask_mags + EPS)
        mask_mags = jnp.tanh(mask_mags + EPS)
        # est_phase = phase + atan2(imag_phase + EPS, real_phase): apply
        # the rotation with the angle-sum identity on the unit vectors
        # (cos_m, sin_m) — algebraic, no trig (ref uformer.py:243-257)
        cos_m, sin_m = unit_phase(real_phase, imag_phase)
        mask_mags = jnp.pad(mask_mags, ((0, 0), (0, 0), (1, 0)))
        cos_m = jnp.pad(cos_m, ((0, 0), (0, 0), (1, 0)),
                        constant_values=1.0)  # DC: mask_phase = 0
        sin_m = jnp.pad(sin_m, ((0, 0), (0, 0), (1, 0)))
        cos_est = cos_p * cos_m - sin_p * sin_m
        sin_est = sin_p * cos_m + cos_p * sin_m

        est_mags = mask_mags * mag_full
        mag_fused = (est_mags + mag) * 0.5

        out_re = mag_fused * cos_est
        out_im = mag_fused * sin_est
        out_cplx = (out_re, out_im)
        if self.compressed:
            mag_fused = mag_fused**2
            out_re = mag_fused * cos_est
            out_im = mag_fused * sin_est
        est = istft(out_re, out_im, cfg, length=out_len)
        return est, src_rt, out_cplx, src_cplx


# ---------------------------------------------------------------- conversion

def _cconv(sd, p, transpose=False):
    fn = tc.conv_transpose2d if transpose else tc.conv2d
    out = {"real_conv": fn(sd, f"{p}.real_conv"),
           "imag_conv": fn(sd, f"{p}.imag_conv")}
    for v in out.values():  # torch kernels are (kf, kt); ours (kt, kf)
        v["kernel"] = v["kernel"].transpose(1, 0, 2, 3)
    return out


def _rconv(sd, p, transpose=False):
    fn = tc.conv_transpose2d if transpose else tc.conv2d
    out = {"conv": fn(sd, p)}
    out["conv"]["kernel"] = out["conv"]["kernel"].transpose(1, 0, 2, 3)
    return out


def _ln(sd, p):
    return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}


def _prelu(sd, p):
    return {"weight": sd[f"{p}.weight"].reshape(())}


def _cdense(sd, p):
    return {"linear_real": tc.dense(sd, f"{p}.real_linear"),
            "linear_imag": tc.dense(sd, f"{p}.imag_linear")}


def _ff_cplx(sd, p):
    return {"ln": _ln(sd, f"{p}.layernorm_linear"),
            "linear1": _cdense(sd, f"{p}.linear1"),
            "linear2": _cdense(sd, f"{p}.linear2"),
            "prelu": _prelu(sd, f"{p}.prelu")}


def _ff_real(sd, p):
    return {"ln": _ln(sd, f"{p}.layernorm_linear"),
            "linear1": tc.dense(sd, f"{p}.linear1.linear"),
            "linear2": tc.dense(sd, f"{p}.linear2.linear"),
            "prelu": _prelu(sd, f"{p}.prelu")}


def _single_att(sd, p):
    return {"query": tc.dense(sd, f"{p}.query.linear"),
            "key": tc.dense(sd, f"{p}.key.linear"),
            "value": tc.dense(sd, f"{p}.value.linear")}


def _cplx_att(sd, p, axis):
    att_name = "T_att" if axis == "t" else "F_att"
    inner = {f"att{k}": _single_att(sd, f"{p}.attn_heads.0.{att_name}{k}")
             for k in range(1, 9)}
    inner["ln1"] = _ln(sd, f"{p}.attn_heads.0.layernorm1")
    inner["ln2"] = _ln(sd, f"{p}.attn_heads.0.layernorm2")
    return {"att": inner,
            "transform": _cdense(sd, f"{p}.transform_linear"),
            "ln3": _ln(sd, f"{p}.layernorm3"),
            "prelu": _prelu(sd, f"{p}.prelu")}


def _real_att(sd, p, axis):
    att_name = "T_att" if axis == "t" else "F_att"
    return {"ln1": _ln(sd, f"{p}.attn_heads.0.layernorm1"),
            "ln2": _ln(sd, f"{p}.attn_heads.0.layernorm2"),
            "att": _single_att(sd, f"{p}.attn_heads.0.{att_name}"),
            "transform": tc.dense(sd, f"{p}.transform_linear.linear"),
            "ln3": _ln(sd, f"{p}.layernorm3"),
            "prelu": _prelu(sd, f"{p}.prelu")}


def _dsconv_cplx(sd, p):
    return {"ln1": _ln(sd, f"{p}.layernorm_conv1"),
            "conv1x1": _cconv(sd, f"{p}.conv1x1"),
            "prelu": _prelu(sd, f"{p}.prelu"),
            "dconv1": _cconv(sd, f"{p}.dconv1"),
            "dconv2": _cconv(sd, f"{p}.dconv2"),
            "ln2": _ln(sd, f"{p}.layernorm_conv2"),
            "sconv": _cconv(sd, f"{p}.sconv")}


def _dsconv_real(sd, p):
    return {"ln1": _ln(sd, f"{p}.layernorm_conv1"),
            "conv1x1": _rconv(sd, f"{p}.conv1x1.conv"),
            "prelu": _prelu(sd, f"{p}.prelu"),
            "dconv1": _rconv(sd, f"{p}.dconv1.conv"),
            "dconv2": _rconv(sd, f"{p}.dconv2.conv"),
            "ln2": _ln(sd, f"{p}.layernorm_conv2"),
            "sconv": _rconv(sd, f"{p}.sconv.conv")}


def from_reference_state_dict(sd: dict) -> dict:
    params: dict = {}
    stats: dict = {}
    for i in range(6):
        params[f"enc{i}"] = _cconv(sd, f"encoder.{i}.0")
        params[f"enc_bn{i}"] = {"bn3d": tc.batchnorm_params(sd, f"encoder.{i}.1")}
        stats[f"enc_bn{i}"] = {"bn3d": tc.batchnorm_stats(sd, f"encoder.{i}.1")}
        params[f"enc_act{i}"] = _prelu(sd, f"encoder.{i}.2")
        params[f"enc_real{i}"] = _rconv(sd, f"encoder_real.{i}.0.conv")
        params[f"enc_real_bn{i}"] = tc.batchnorm_params(sd, f"encoder_real.{i}.1")
        stats[f"enc_real_bn{i}"] = tc.batchnorm_stats(sd, f"encoder_real.{i}.1")
        params[f"enc_real_act{i}"] = _prelu(sd, f"encoder_real.{i}.2")

        params[f"dec{i}"] = _cconv(sd, f"decoder.{i}.0", transpose=True)
        params[f"dec_real{i}"] = _rconv(sd, f"decoder_real.{i}.0.conv",
                                        transpose=True)
        if i < 5:
            params[f"dec_bn{i}"] = {"bn3d": tc.batchnorm_params(sd, f"decoder.{i}.1")}
            stats[f"dec_bn{i}"] = {"bn3d": tc.batchnorm_stats(sd, f"decoder.{i}.1")}
            params[f"dec_act{i}"] = _prelu(sd, f"decoder.{i}.2")
            params[f"dec_real_bn{i}"] = tc.batchnorm_params(sd, f"decoder_real.{i}.1")
            stats[f"dec_real_bn{i}"] = tc.batchnorm_stats(sd, f"decoder_real.{i}.1")
            params[f"dec_real_act{i}"] = _prelu(sd, f"decoder_real.{i}.2")

    conf: dict = {
        "ff1_cplx": _ff_cplx(sd, "conformer.ff1_cplx"),
        "ff1_mag": _ff_real(sd, "conformer.ff1_mag"),
        "ff2_cplx": _ff_cplx(sd, "conformer.ff2_cplx"),
        "ff2_mag": _ff_real(sd, "conformer.ff2_mag"),
        "cplx_tatt": _cplx_att(sd, "conformer.cplx_tatt", "t"),
        "cplx_fatt": _cplx_att(sd, "conformer.cplx_fatt", "f"),
        "mag_tatt": _real_att(sd, "conformer.mag_tatt", "t"),
        "mag_fatt": _real_att(sd, "conformer.mag_fatt", "f"),
        "ln_conformer_cplx": _ln(sd, "conformer.ln_conformer_cplx"),
        "ln_conformer_mag": _ln(sd, "conformer.ln_conformer_mag"),
    }
    for idx in range(8):
        conf[f"dsconv_cplx{idx}"] = _dsconv_cplx(sd, f"conformer.dsconv_cplx.{idx}")
        conf[f"dsconv_real{idx}"] = _dsconv_real(sd, f"conformer.dsconv_real.{idx}")
    params["conformer"] = conf
    return {"params": params, "batch_stats": stats}


register(
    ModelEntry(
        name="uformer",
        make=Uformer,
        stft=PRESET_UFORMER,
        io_kind="waveform",
        from_reference_state_dict=from_reference_state_dict,
        variants=("cprs",),
    )
)
