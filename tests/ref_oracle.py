"""Load reference (PyTorch) modules as numeric oracles for parity tests.

The reference repo is mounted read-only at /root/reference. Its top-level
modules import packages absent from this image (vocos, torchaudio, librosa,
tensorboard); we stub those since the modules under test (encoders, unet1d,
samplers) only need torch + einops.
"""

from __future__ import annotations

import sys
import types

REFERENCE = "/root/reference"


def _stub(name: str, **attrs):
    """Register a stub module ONLY if the real package is absent — stubbing
    an installed package (e.g. accelerate) shadows its submodules for every
    later import in the test session."""
    if name in sys.modules:
        return
    import importlib.util

    try:
        if importlib.util.find_spec(name) is not None:
            return
    except (ImportError, ValueError):
        pass
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def load_reference():
    """Import reference `model` and `operations` with dependency stubs.
    Returns (model_module, operations_module)."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    class _Dummy:  # placeholder class for unused imports
        def __init__(self, *a, **k):
            pass

        @classmethod
        def from_pretrained(cls, *a, **k):
            return cls()

    _stub("vocos", Vocos=_Dummy)
    transforms = types.ModuleType("torchaudio.transforms")
    transforms.Resample = _Dummy
    transforms.MelSpectrogram = _Dummy
    _stub("torchaudio", transforms=transforms, load=None, save=None)
    sys.modules.setdefault("torchaudio.transforms", transforms)
    _stub("librosa", feature=types.SimpleNamespace(rms=None))
    _stub("torch.utils.tensorboard", SummaryWriter=_Dummy)
    _stub("accelerate",
          Accelerator=_Dummy, DistributedDataParallelKwargs=_Dummy)

    import operations  # noqa: F401
    import model  # noqa: F401
    return model, operations


def load_reference_unet():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from unet1d.unet_1d_condition import UNet1DConditionModel
    from unet1d import embeddings
    return UNet1DConditionModel, embeddings


def load_reference_samplers():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from sampler import dpm_solver, uni_pc
    return dpm_solver, uni_pc
