"""Checkpointing with the reference's pointer-file conventions on Orbax.

Mirrors Uformer/misc.py:16-73: checkpoints are saved as
`model.ckpt-{epoch}-{step}` with a `checkpoint` pointer file naming the
latest, plus a `best` pointer updated on validation improvement
(the BEST_MODEL/ convention, ref DCCRN/config.py:19-24).
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def _ckpt_name(epoch: int, step: int) -> str:
    return f"model.ckpt-{epoch}-{step}"


def save_checkpoint(checkpoint_dir: str, state, epoch: int, step: int,
                    best: bool = False) -> str:
    os.makedirs(checkpoint_dir, exist_ok=True)
    name = _ckpt_name(epoch, step)
    path = os.path.abspath(os.path.join(checkpoint_dir, name))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    with open(os.path.join(checkpoint_dir, "checkpoint"), "w") as f:
        f.write(name)
    if best:
        with open(os.path.join(checkpoint_dir, "best"), "w") as f:
            f.write(name)
    return path


def latest_checkpoint(checkpoint_dir: str, best: bool = False) -> str | None:
    pointer = os.path.join(checkpoint_dir, "best" if best else "checkpoint")
    if not os.path.isfile(pointer):
        return None
    with open(pointer) as f:
        name = f.read().strip()
    return os.path.abspath(os.path.join(checkpoint_dir, name))


def restore_checkpoint(checkpoint_dir: str, target_state,
                       best: bool = False):
    """Restore into the structure of `target_state`; returns (state, found)."""
    path = latest_checkpoint(checkpoint_dir, best=best)
    if path is None:
        return target_state, False
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, jax.device_get(target_state))
    # restored leaves may be device arrays with jit/restore provenance;
    # feeding them to a compiled step risks the axon op-storm poison
    # (se_tpu/utils/layouts.py) — canonicalize at this boundary too
    from se_tpu.utils.layouts import canonicalize_layouts

    return canonicalize_layouts(restored), True


def parse_epoch_step(checkpoint_dir: str) -> tuple[int, int]:
    path = latest_checkpoint(checkpoint_dir)
    if path is None:
        return 0, 0
    name = os.path.basename(path)  # model.ckpt-{epoch}-{step}
    _, epoch, step = name.rsplit("-", 2)
    return int(epoch), int(step)
