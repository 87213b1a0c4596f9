"""Parameter/FLOPs reporting (the reference's numParams + ptflops role,
ref SURVEY.md §5 "Tracing / profiling"; MACs table parity: BASELINE.md
Table D)."""

from __future__ import annotations

import contextlib

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (the reference's tf.compat.v1.profiler /
    model-summary role, ref DeepXi/deepxi/model.py:737-743); view with
    TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def num_params(variables_or_params) -> int:
    """Total parameter count (ref LSTM/Backup.py:94-99 numParams)."""
    tree = variables_or_params
    if isinstance(tree, dict) and "params" in tree:
        tree = tree["params"]
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(tree)))


def flops_estimate(fn, *args) -> float | None:
    """XLA cost-analysis FLOPs for a jitted callable (ptflops equivalent)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:  # noqa: BLE001 — backends may not expose cost analysis
        return None


def summary(name: str, variables, fn=None, *args) -> str:
    lines = [f"model: {name}", f"params: {num_params(variables) / 1e6:.2f} M"]
    if fn is not None:
        fl = flops_estimate(fn, *args)
        if fl:
            lines.append(f"flops/call: {fl / 1e9:.2f} G")
    return "\n".join(lines)
