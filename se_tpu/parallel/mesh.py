"""Mesh construction and sharding helpers.

Typical use:

    mesh = make_mesh({"data": 4, "model": 2})
    state = replicate(state, mesh)
    batch = shard_batch(batch, mesh)          # leading axis over 'data'
    with activation_mesh(mesh):
        loss, state = train_step(state, batch)  # jitted

Inside model code, `shard_activation(x, None, "model")` lays an activation
axis over the 'model' mesh axis when a mesh is active and is a no-op
otherwise — this is how the Uformer axial-attention folds pick up
sequence-parallel sharding without threading a mesh through every module
(ref SURVEY.md §2.5 consequence (2)).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE_MESH: contextvars.ContextVar[Mesh | None] = contextvars.ContextVar(
    "se_tpu_active_mesh", default=None
)


def make_mesh(axes: Mapping[str, int] | None = None,
              devices=None) -> Mesh:
    """Build a Mesh. Default: all devices on a single 'data' axis."""
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"data": len(devices)}
    names = tuple(axes)
    shape = tuple(axes[n] for n in names)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh {dict(axes)} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Shard every leaf's leading dimension across `axis`."""

    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


@contextlib.contextmanager
def activation_mesh(mesh: Mesh | None):
    """Make `mesh` visible to shard_activation inside jitted model code."""
    token = _ACTIVE_MESH.set(mesh)
    try:
        yield
    finally:
        _ACTIVE_MESH.reset(token)


def active_mesh() -> Mesh | None:
    return _ACTIVE_MESH.get()


def shard_activation(x, *spec):
    """with_sharding_constraint(x, P(*spec)) if a mesh with those axes is
    active; identity otherwise. Unknown axis names — and axes whose dimension
    is not divisible by the mesh axis size (XLA requires even partitions) —
    degrade to None."""
    mesh = _ACTIVE_MESH.get()
    if mesh is None:
        return x

    def keep(dim: int, s):
        if s is None or s not in mesh.axis_names:
            return None
        return s if x.shape[dim] % mesh.shape[s] == 0 else None

    cleaned = tuple(keep(i, s) for i, s in enumerate(spec))
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*cleaned))
    )


def shard_map_leading(fn, mesh: Mesh, leading_dim: int, n_mapped: int,
                      n_replicated: int = 0):
    """Wrap `fn` in a shard_map that splits the LEADING axis of its first
    `n_mapped` args over ALL mesh axes (remaining `n_replicated` args fully
    replicated; single output sharded like the mapped inputs).

    This is how the Pallas kernels stay live under a mesh: GSPMD cannot
    partition pallas_call, but the kernels are independent per leading
    (batch/fold) index, so running them per-shard is exact. Returns None
    when `leading_dim` doesn't divide over the mesh (callers fall back to
    their XLA path)."""
    total = int(np.prod(tuple(mesh.shape.values())))
    if total <= 0 or leading_dim % total != 0:
        return None
    lead = P(mesh.axis_names)
    in_specs = tuple([lead] * n_mapped + [P()] * n_replicated)
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=lead,
                         check_vma=False)


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Multi-host bring-up: jax.distributed over DCN (SURVEY.md §2.5
    consequence (1)). No-op when already initialized or single-process
    with no coordinator configured."""
    import jax

    if jax.process_count() > 1:
        return
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if kwargs:
        jax.distributed.initialize(**kwargs)


def host_local_batch_to_global(batch, mesh: Mesh, axis: str = "data"):
    """Assemble per-host shards into a global array (multi-host input
    pipelines feed host-local data; ref SURVEY.md §5 'Distributed
    communication backend')."""
    import jax

    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x))

    return jax.tree.map(put, batch)
