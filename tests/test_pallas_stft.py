"""Pallas STFT kernel vs the jnp matmul-DFT path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from se_tpu.ops.stft import PRESET_320, PRESET_512_128, StftConfig, stft


def _stft_pallas_interp(x, cfg):
    """Run the pallas kernel in interpreter mode for CPU testing."""
    import functools
    from unittest import mock

    from se_tpu.ops import pallas_stft as ps

    orig = pl.pallas_call
    with mock.patch.object(
        ps.pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        # bypass the jit cache so the interpret flag takes effect
        return ps.stft_pallas.__wrapped__(x, cfg)


@pytest.mark.parametrize("cfg", [PRESET_320, PRESET_512_128,
                                 StftConfig(512, 256, 512, window="hamming",
                                            convention="pad_end")])
def test_pallas_matches_jnp(cfg, rng):
    n = 16000
    x = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    want_re, want_im = stft(x, cfg)
    got_re, got_im = _stft_pallas_interp(x, cfg)
    np.testing.assert_allclose(np.asarray(got_re), np.asarray(want_re),
                               atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_im), np.asarray(want_im),
                               atol=2e-3, rtol=1e-4)


def test_pallas_rejects_non_multiple():
    from se_tpu.ops.pallas_stft import stft_pallas

    with pytest.raises(ValueError):
        stft_pallas(jnp.zeros((1, 16000)),
                    StftConfig(400, 160, 512))
