"""Signal-processing ops: windows, STFT/iSTFT, mel, STDCT, compression."""

from se_tpu.ops.windows import get_window  # noqa: F401
from se_tpu.ops.stft import (  # noqa: F401
    StftConfig,
    num_frames,
    frame_signal,
    stft,
    istft,
    stft_magphase,
    compress_mag,
    decompress_mag,
)
