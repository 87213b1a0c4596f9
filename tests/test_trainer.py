"""Trainer: loss decreases on a toy problem; multi-device data parallelism
on the 8-device CPU mesh; checkpoint save/restore round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from se_tpu.parallel import make_mesh, shard_batch
from se_tpu.train.trainer import (
    TrainConfig,
    batch_to_jax,
    make_train_step,
)


def _toy_batch(rng, b=4, n=4000):
    clean = (rng.standard_normal((b, n)) * 0.1).astype(np.float32)
    noise = (rng.standard_normal((b, n)) * 0.05).astype(np.float32)
    return {
        "mix": jnp.asarray(clean + noise),
        "clean": jnp.asarray(clean),
        "frames": jnp.full((b,), n // 160 + 1, jnp.int32),
    }


@pytest.mark.parametrize("name", ["lstm", "dpcrn"])
def test_loss_decreases(rng, name):
    cfg = TrainConfig(model=name, learning_rate=5e-4)
    model, init_fn, step_fn, eval_fn = make_train_step(cfg)
    batch = _toy_batch(rng)
    state = init_fn(jax.random.PRNGKey(0), batch)
    first = None
    for _ in range(8):
        state, loss = step_fn(state, batch)
        if first is None:
            first = float(loss)
    assert float(loss) < first


def test_data_parallel_step_matches_single(rng):
    assert len(jax.devices()) == 8
    cfg = TrainConfig(model="lstm", learning_rate=1e-3)
    model, init_fn, step_fn, eval_fn = make_train_step(cfg)
    batch = _toy_batch(rng, b=8)
    state = init_fn(jax.random.PRNGKey(0), batch)
    _, loss_single = step_fn(state, batch)

    mesh = make_mesh({"data": 8})
    cfg2 = TrainConfig(model="lstm", learning_rate=1e-3)
    model2, init_fn2, step_fn2, _ = make_train_step(cfg2, mesh=mesh)
    state2 = init_fn2(jax.random.PRNGKey(0), batch)
    sharded = shard_batch(batch, mesh)
    _, loss_dp = step_fn2(state2, sharded)
    np.testing.assert_allclose(float(loss_dp), float(loss_single), rtol=1e-5)


def test_model_sharded_uformer_step_matches_single(rng):
    """The (data x model) mesh path (Uformer attention folds sharded over the
    'model' axis — the dryrun_multichip configuration) must be numerically
    equivalent to the single-device step."""
    from se_tpu.parallel import activation_mesh

    assert len(jax.devices()) == 8
    batch = _toy_batch(rng, b=4, n=2560)
    cfg = TrainConfig(model="uformer", learning_rate=1e-3)
    _, init_fn, step_fn, _ = make_train_step(cfg)
    state = init_fn(jax.random.PRNGKey(0), batch)
    _, loss_single = step_fn(state, batch)

    mesh = make_mesh({"data": 4, "model": 2})
    _, init_fn2, step_fn2, _ = make_train_step(cfg, mesh=mesh)
    with activation_mesh(mesh):
        sharded = shard_batch(batch, mesh)
        state2 = init_fn2(jax.random.PRNGKey(0), sharded)
        _, loss_tp = step_fn2(state2, sharded)
    np.testing.assert_allclose(float(loss_tp), float(loss_single),
                               rtol=2e-5)


def test_checkpoint_roundtrip(tmp_path, rng):
    from se_tpu.train.checkpoint import (
        parse_epoch_step,
        restore_checkpoint,
        save_checkpoint,
    )

    cfg = TrainConfig(model="lstm")
    model, init_fn, step_fn, _ = make_train_step(cfg)
    batch = _toy_batch(rng, b=2, n=2000)
    state = init_fn(jax.random.PRNGKey(0), batch)
    state, _ = step_fn(state, batch)
    save_checkpoint(str(tmp_path), state, epoch=1, step=int(state["step"]))
    blank = init_fn(jax.random.PRNGKey(1), batch)
    restored, found = restore_checkpoint(str(tmp_path), blank)
    assert found
    assert parse_epoch_step(str(tmp_path)) == (1, 1)
    w0 = state["params"]["fc"]["kernel"]
    w1 = restored["params"]["fc"]["kernel"]
    np.testing.assert_allclose(np.asarray(w0), np.asarray(w1))


@pytest.mark.parametrize("name", ["gcrn", "fullsubnet", "uformer"])
def test_train_step_smoke_bn_dropout_paths(rng, name):
    """Train-mode paths: BN batch-stats updates (gcrn), drop_band with B>1
    (fullsubnet), dropout rngs + in-graph STFT (uformer)."""
    cfg = TrainConfig(model=name, learning_rate=1e-4)
    model, init_fn, step_fn, eval_fn = make_train_step(cfg)
    batch = _toy_batch(rng, b=4, n=4000)
    state = init_fn(jax.random.PRNGKey(0), batch)
    state, loss = step_fn(state, batch)
    assert np.isfinite(float(loss))
    if name == "gcrn":  # running stats actually updated
        bs0 = init_fn(jax.random.PRNGKey(0), batch)["extra_vars"]["batch_stats"]
        bs1 = state["extra_vars"]["batch_stats"]
        d = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a - b)).max()),
                         bs0, bs1)
        assert max(jax.tree.leaves(d)) > 0
    assert np.isfinite(float(eval_fn(state, batch)))


@pytest.mark.parametrize("remat", ["dots", "full"])
def test_remat_matches_plain_step(rng, remat):
    """Rematerialized training is numerically identical to the plain step
    (same loss and same updated params after one step)."""
    batch = _toy_batch(rng)
    states = {}
    for policy in ("none", remat):
        cfg = TrainConfig(model="gcrn", learning_rate=1e-3, remat=policy)
        _, init_fn, step_fn, _ = make_train_step(cfg)
        state = init_fn(jax.random.PRNGKey(0), batch)
        state, loss = step_fn(state, batch)
        states[policy] = (float(loss), state["params"])
    l0, p0 = states["none"]
    l1, p1 = states[remat]
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    # recomputation reassociates fp reductions; Adam's 1/sqrt(v) amplifies
    # the resulting ~1e-7 grad noise where v is tiny, so allow a tolerance
    # of 10% of one update (lr=1e-3) on the post-step params
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-4), p0, p1)


@pytest.mark.parametrize("name", ["lstm", "uformer"])
def test_bf16_training_tracks_fp32(rng, name):
    """bf16 compute with fp32 master weights: params stay fp32, loss is
    finite and close to the fp32 step, and training still converges."""
    batch = _toy_batch(rng, b=2, n=3200)
    losses = {}
    for dt in ("fp32", "bf16"):
        cfg = TrainConfig(model=name, learning_rate=5e-4, compute_dtype=dt)
        _, init_fn, step_fn, _ = make_train_step(cfg)
        state = init_fn(jax.random.PRNGKey(0), batch)
        first = None
        for _ in range(4):
            state, loss = step_fn(state, batch)
            if first is None:
                first = float(loss)
        losses[dt] = (first, float(loss))
        # master weights remain fp32
        leaves = jax.tree.leaves(state["params"])
        assert all(l.dtype == jnp.float32 for l in leaves)
        assert np.isfinite(float(loss))
        assert float(loss) < first  # still learns
    f32, b16 = losses["fp32"][0], losses["bf16"][0]
    assert abs(f32 - b16) / (abs(f32) + 1e-9) < 0.05, losses


def test_dccrn_snr_fusion_snr_loss_decreases(rng):
    """The DCCRN_SNR recipe (waveform fusion SNR loss on the snr_variant
    decoder crop) trains on a toy problem (VERDICT r1 item 7 plumbing)."""
    cfg = TrainConfig(model="dccrn", loss="fusion_snr", learning_rate=5e-4,
                      model_kwargs={"snr_variant": True})
    model, init_fn, step_fn, eval_fn = make_train_step(cfg)
    batch = _toy_batch(rng, b=2, n=4096)
    state = init_fn(jax.random.PRNGKey(0), batch)
    first = None
    for _ in range(6):
        state, loss = step_fn(state, batch)
        if first is None:
            first = float(loss)
    assert np.isfinite(float(loss))
    assert float(loss) < first
