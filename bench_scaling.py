"""Data-parallel scaling-efficiency harness.

Measures training-step throughput (audio-seconds/s) at mesh sizes 1 and N
on whatever devices exist — real chips on a pod slice, or the virtual CPU
mesh (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)
for plumbing validation. On multi-host pods, launch one process per host
(se_tpu.parallel.initialize_multihost) and the same script reports pod-level
scaling.

Prints one JSON line per mesh size plus the scaling efficiency.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def measure(model_name: str, n_devices: int, batch_per_device: int = 4,
            seconds: float = 4.0, iters: int = 4) -> float:
    from se_tpu.parallel import activation_mesh, make_mesh, shard_batch
    from se_tpu.train.trainer import TrainConfig, make_train_step

    devices = jax.devices()[:n_devices]
    mesh = make_mesh({"data": n_devices}, devices=devices)
    cfg = TrainConfig(model=model_name)
    model, init_fn, step_fn, _ = make_train_step(cfg, mesh=mesh)

    b = batch_per_device * n_devices
    n = int(seconds * 16000)
    rng = np.random.default_rng(0)
    clean = (rng.standard_normal((b, n)) * 0.1).astype(np.float32)
    batch = {
        "mix": jnp.asarray(clean),
        "clean": jnp.asarray(clean),
        "frames": jnp.full((b,), n // 160 + 1, jnp.int32),
    }
    with activation_mesh(mesh):
        sharded = shard_batch(batch, mesh)
        state = init_fn(jax.random.PRNGKey(0), sharded)
        state, loss = step_fn(state, sharded)  # compile
        loss.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = step_fn(state, sharded)
        loss.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
    return b * seconds / dt


def main():
    model = os.environ.get("SE_TPU_SCALE_MODEL", "dpcrn")
    bpd = int(os.environ.get("SE_TPU_SCALE_BATCH", "4"))
    seconds = float(os.environ.get("SE_TPU_SCALE_SECONDS", "4"))
    n_all = len(jax.devices())
    t1 = measure(model, 1, batch_per_device=bpd, seconds=seconds)
    print(json.dumps({"mesh": 1, "model": model,
                      "train_audio_s_per_s": round(t1, 2)}))
    if n_all > 1:
        tn = measure(model, n_all, batch_per_device=bpd, seconds=seconds)
        eff = tn / (t1 * n_all)
        print(json.dumps({"mesh": n_all, "model": model,
                          "train_audio_s_per_s": round(tn, 2),
                          "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
