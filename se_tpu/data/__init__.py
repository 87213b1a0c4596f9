"""Data pipeline: wav I/O, JSON manifests, bucketed batching."""

from se_tpu.data.wav import read_wav, write_wav, resample  # noqa: F401
from se_tpu.data.dataset import (  # noqa: F401
    Batch,
    ManifestDataset,
    rms_gain,
)
