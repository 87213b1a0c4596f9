"""Native (C++) runtime components. See native.py for the ctypes bindings."""

from se_tpu.runtime.native import available, wav_decode_native  # noqa: F401
