"""Load reference PyTorch model modules by path for golden parity tests.

The reference tree (read-only at /root/reference) has no package structure;
modules do sibling imports (`from Backup import numParams`), so the model's
directory is pushed onto sys.path while importing.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np

REFERENCE_ROOT = "/root/reference"

# Reference modules import audio/profiling libs absent from this image at
# module top level (librosa, soundfile, ptflops, torch_complex); the model
# classes themselves don't need them, so stub what's missing.
_STUBBED = ("librosa", "librosa.output", "soundfile", "ptflops",
            "ptflops.flops_counter", "torch_complex", "pesq", "pystoi",
            "pystoi.stoi", "conv_stft", "matplotlib", "matplotlib.pyplot",
            "data", "Step2_config", "show", "librosa.filters")


def _install_stubs():


    for name in _STUBBED:
        if name in sys.modules:
            continue
        try:
            if importlib.util.find_spec(name) is not None:
                continue  # actually importable
        except (ImportError, ModuleNotFoundError, ValueError):
            pass

        from unittest.mock import MagicMock

        sys.modules[name] = MagicMock(name=f"stub:{name}")


def load_reference_module(subpath: str):
    """e.g. load_reference_module('GCRN/GCRN_noncprs.py')"""
    full = os.path.join(REFERENCE_ROOT, subpath)
    mod_dir = os.path.dirname(full)
    name = "ref_" + subpath.replace("/", "_").removesuffix(".py")
    if name in sys.modules:
        return sys.modules[name]
    _install_stubs()
    if "complexnn" not in sys.modules:
        # DCCRN's complexnn is absent from the reference repo; use our torch
        # oracle reconstruction (tests/torch_complexnn.py).
        from tests import torch_complexnn

        sys.modules["complexnn"] = torch_complexnn
    # Module dir for sibling imports, parent dir for package-style imports
    # (FullSubNet/fullsubnet_net_sa is a real package).
    paths = [mod_dir, os.path.dirname(mod_dir)]
    for p in paths:
        sys.path.insert(0, p)
    try:
        spec = importlib.util.spec_from_file_location(name, full)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    finally:
        for p in paths:
            sys.path.remove(p)
    return mod


def state_dict_numpy(model) -> dict[str, np.ndarray]:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
