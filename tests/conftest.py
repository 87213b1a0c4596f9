"""Test config: run JAX on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes a backend, so this executes at
conftest import time (pytest imports conftest before test modules).
"""

import os

# The session environment pins JAX_PLATFORMS=axon (the real-TPU tunnel) and a
# sitecustomize imports jax at interpreter start, so env vars alone are too
# late — override through jax.config before any backend is initialized.
os.environ["JAX_PLATFORMS"] = os.environ.get("SE_TPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


# ------------------------------------------------------------------ test tiers
# Quick tier: `pytest -m "not slow"` (~3 min on CPU). The slow set is the
# measured >=5 s tail of the suite (VERDICT r1 weak item 7); parametrized
# entries are per-id so each family keeps a fast representative.

_SLOW_IDS = {
    # trainer sweeps / mesh equality / convergence
    "test_model_sharded_uformer_step_matches_single",
    "test_data_parallel_step_matches_single",
    "test_checkpoint_roundtrip",
    "test_bf16_training_tracks_fp32[lstm]",
    "test_bf16_training_tracks_fp32[uformer]",
    "test_train_step_smoke_bn_dropout_paths[gcrn]",
    "test_train_step_smoke_bn_dropout_paths[fullsubnet]",
    "test_train_step_smoke_bn_dropout_paths[uformer]",
    "test_remat_matches_plain_step[dots]",
    "test_remat_matches_plain_step[full]",
    "test_loss_decreases[lstm]",
    "test_dccrn_snr_fusion_snr_loss_decreases",
    "test_loss_decreases[dpcrn]",
    # cli/config sweeps (keep lstm/deepxi param-count as quick reps)
    "test_param_count_matches_published[uformer]",
    "test_param_count_matches_published[dccrn]",
    "test_param_count_matches_published[ctsnet]",
    "test_param_count_matches_published[crn]",
    "test_param_count_matches_published[dpcrn]",
    "test_param_count_matches_published[gcrn]",
    "test_param_count_matches_published[fullsubnet]",
    "test_param_count_matches_published[g2net]",
    "test_param_count_matches_published[taylorsenet]",
    "test_cli_stream_both_modes",
    "test_cli_enhance_and_score",
    "test_flops_estimate_matches_published_macs",
    # heavy parity cases (fast reps stay: crn/gcrn/dpcrn/g2net parity)
    "test_uformer_parity",
    "test_ctsnet_parity[cln]",
    "test_taylorsenet_decode_path_parity",
    "test_ctsnet_decode_path_parity",
    # deepxi heavies
    "test_rdlnet_selectable_via_deepxi",
    "test_rdlnet_shapes_and_causality[ReLU->LN->W+b]",
    "test_prelim_toy_trainer_converges",
    "test_deepxi_driver_end_to_end",
    "test_deepxi_end_to_end_enhance",
    "test_mhanet_masks_padded_frames[True]",
    "test_mhanet_masks_padded_frames[False]",
    # zoo enhance smoke (fast reps stay: lstm/crn)
    "test_enhance_smoke[dccrn]",
    "test_enhance_smoke[ctsnet]",
    "test_enhance_smoke[dpcrn]",
    "test_enhance_smoke[taylorsenet]",
    "test_enhance_smoke[g2net]",
    "test_enhance_smoke[fullsubnet]",
    "test_enhance_smoke[gcrn]",
    # streaming
    "test_windowed_streaming_close[dpcrn]",
    "test_windowed_streaming_close[gcrn]",
    "test_windowed_handles_ragged_tail",
    # round-3 measured >=6 s tail (pytest --durations; each family keeps a
    # fast representative in the quick tier)
    "test_dsconv_under_mesh_grad_flows",
    "test_causal_streaming_exact[dpcrn]",
    "test_causal_streaming_exact[crn]",
    "test_dsconv_grad_matches_reference",
    "test_dsconv_kernel_matches_reference[2-1-8]",
    "test_fused_attention_grad_matches",
    "test_ctsnet_parity[in]",
    "test_enhance_bf16_smoke",
    "test_dccrn_parity[False]",
    "test_dsconv_module_composed_equivalence",
    "test_rdlnet_shapes_and_causality[scale*LN+center->ReLU->W+b]",
    "test_pallas_lstm_grad_large_folded_batch",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name in _SLOW_IDS:
            item.add_marker(pytest.mark.slow)
