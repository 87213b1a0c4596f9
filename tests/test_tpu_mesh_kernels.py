"""On-chip (non-interpret) kernel-under-mesh checks (VERDICT r3 item 7).

The CPU-mesh tests in test_mesh_kernels.py cover the shard_map'd kernel
paths only in interpret mode, and `dryrun_multichip` never executes a
Pallas kernel (every kernel takes its platform-gated XLA fallback on the
CPU mesh). These tests compile shard_map(pallas_call) for real:

    SE_TPU_TEST_PLATFORM=axon python -m pytest tests/ -m tpu -q

On the single local chip the mesh is 1x1 — that still exercises the
shard_map lowering of each pallas_call so the first real multi-chip run
is not its first compile. Deselected from the default quick tier (no
`-m tpu`) and skipped outright on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from se_tpu.parallel import activation_mesh, make_mesh

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.devices()[0].platform not in ("tpu", "axon"),
        reason="needs a real TPU device (SE_TPU_TEST_PLATFORM=axon)"),
]


@pytest.fixture
def mesh():
    n = len(jax.devices())
    d = 2 if n % 2 == 0 else 1
    return make_mesh({"data": n // d, "model": d})


def test_attention_on_chip_under_mesh(rng, mesh):
    from se_tpu.ops.pallas_attention import _reference, sdp_attention

    n, h, l, d = 16, 8, 64, 16
    q = jnp.asarray(rng.standard_normal((n, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((n, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n, h, l, d)), jnp.float32)
    want = _reference(q, k, v, 0.25)
    with activation_mesh(mesh):
        got = sdp_attention(q, k, v, 0.25, interpret=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_dsconv_on_chip_under_mesh(rng, mesh):
    from tests.test_mesh_kernels import _dsconv_inputs

    from se_tpu.ops.pallas_dsconv import _reference, dsconv_block

    x, params = _dsconv_inputs(rng)
    want = _reference(x, params, 1, 2, 1)
    with activation_mesh(mesh):
        got = dsconv_block(x, params, 1, 2, ncomp=1, interpret=False)
    # MXU matmuls multiply in bf16 at default precision; the kernel's
    # in-VMEM im2col dots split/accumulate differently from XLA's conv
    # emitter, and the block's gated sigmoids amplify the rounding (max
    # abs ~6e-3 observed on-chip). Assert relative L2 (robust to
    # near-zero elements) at the bf16-pipeline bound; elementwise
    # fp32-epsilon agreement is covered by the interpret-mode tests.
    got, want = np.asarray(got), np.asarray(want)
    rel_l2 = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel_l2 < 5e-3, rel_l2
    assert np.max(np.abs(got - want)) < 2e-2


def test_lstm_on_chip_under_mesh(rng, mesh):
    from se_tpu.ops.pallas_lstm import pallas_lstm_layer

    b, t, in_dim, h = 16, 12, 8, 16
    x = jnp.asarray(rng.standard_normal((b, t, in_dim)), jnp.float32)
    wx = jnp.asarray(rng.standard_normal((in_dim, 4 * h)) * 0.2, jnp.float32)
    wh = jnp.asarray(rng.standard_normal((h, 4 * h)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((4 * h,)) * 0.1, jnp.float32)
    want = pallas_lstm_layer(x, wx, wh, bias, interpret=True)
    with activation_mesh(mesh):
        got = pallas_lstm_layer(x, wx, wh, bias, interpret=False)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_dsconv_on_chip_grad_under_mesh(rng, mesh):
    from tests.test_mesh_kernels import _dsconv_inputs

    from se_tpu.ops.pallas_dsconv import dsconv_block

    x, params = _dsconv_inputs(rng)

    def loss(x, w1, interpret):
        p = params[:2] + (w1,) + params[3:]
        return jnp.mean(dsconv_block(x, p, 1, 2, ncomp=1,
                                     interpret=interpret) ** 2)

    g_ref = jax.grad(loss, argnums=(0, 1))(x, params[2], True)
    with activation_mesh(mesh):
        g_chip = jax.grad(loss, argnums=(0, 1))(x, params[2], False)
    for a, b in zip(g_chip, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
