"""Name -> (model constructor, STFT preset, io-kind) registry.

io-kind describes what the model consumes/produces so the shared decode/train
drivers can wire the DSP front-end uniformly:

- "mag_mask":     magnitude in, magnitude estimate out, noisy phase reused
- "complex_map":  (re, im) channels in, (re, im) estimate out
- "complex_mask": (re, im) in, complex ratio mask applied inside the model
- "cirm":         magnitude in, compressed complex ratio mask out
- "waveform":     waveform in / waveform out (STFT in-graph)
- "hybrid":       DeepXi-style a-priori-SNR estimator + statistical gain
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

from se_tpu.ops.stft import StftConfig


@dataclasses.dataclass(frozen=True)
class ModelEntry:
    name: str
    make: Callable[..., Any]
    stft: StftConfig
    io_kind: str
    from_reference_state_dict: Callable[[dict], dict] | None = None
    variants: tuple[str, ...] = ()


_REGISTRY: dict[str, ModelEntry] = {}


def register(entry: ModelEntry) -> None:
    _REGISTRY[entry.name] = entry


def get_model(name: str) -> ModelEntry:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def available_models() -> list[str]:
    return sorted(_REGISTRY)
