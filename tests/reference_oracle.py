"""Helpers to load the upstream reference implementation as a *test oracle*.

The reference at /root/reference is used read-only, imported (never copied)
purely to produce golden tensors for numerical parity tests. Missing optional
deps (librosa, soundfile, matplotlib) are stubbed out since the oracle paths
we exercise never call them.

Scoping: every stub module is tagged ``__sfsn_test_stub__`` and the stub
callables RAISE instead of silently returning dummy values, and an autouse
fixture in conftest.py removes the stubs and the reference sys.path entries
after each test — so installing the oracle in one test can never poison a
later test's real-import behavior (e.g. the PESQ wrapper's no-wheel
fallback test).
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _raise_stub_used(name):
    def _fail(*_a, **_k):
        raise RuntimeError(
            f"test stub for optional dep {name!r} was CALLED — the oracle "
            "code path under test should never reach it"
        )

    return _fail


def _stub(name):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        mod.__dict__["__getattr__"] = lambda *_a, **_k: None
        mod.__sfsn_test_stub__ = True
        sys.modules[name] = mod
    return sys.modules[name]


def remove_stubs():
    """Drop every stub module this module installed from sys.modules.

    sys.path additions deliberately persist (tests lazily import oracle
    modules at call time); only the stub MODULES are poisonous — they
    change later tests' real-import behavior.
    """
    for name, mod in list(sys.modules.items()):
        if getattr(mod, "__sfsn_test_stub__", False):
            del sys.modules[name]


def add_reference_to_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # Optional deps the oracle modules import at module scope but never use
    # in the code paths under test.
    for name in [
        "librosa",
        "librosa.util",
        "soundfile",
        "matplotlib",
        "matplotlib.pyplot",
        "onnxruntime",
        "pesq",
        "pystoi",
        "tqdm.contrib",
        "tqdm.contrib.concurrent",
    ]:
        _stub(name)
    sys.modules["librosa"].util = sys.modules["librosa.util"]
    sys.modules["matplotlib"].pyplot = sys.modules["matplotlib.pyplot"]
    sys.modules["pesq"].pesq = _raise_stub_used("pesq")
    sys.modules["pystoi"].stoi = _raise_stub_used("pystoi")
    sys.modules["tqdm.contrib.concurrent"].process_map = None


def import_reference_gsu():
    """Returns the reference efficient_spiking_neuron module."""
    add_reference_to_path()
    import importlib

    return importlib.import_module(
        "audiozen.models.spiking_fullsubnet.efficient_spiking_neuron"
    )


def import_reference_model():
    """Returns the reference modeling_spiking_fullsubnet module."""
    add_reference_to_path()
    import importlib

    return importlib.import_module(
        "audiozen.models.spiking_fullsubnet.modeling_spiking_fullsubnet"
    )


FREEZE_DIR = REFERENCE_ROOT + "/recipes/intel_ndns/spiking_fullsubnet_freeze_phase"


def import_reference_separator():
    """Returns the frozen competition model module (model_low_freq)."""
    add_reference_to_path()
    if FREEZE_DIR not in sys.path:
        sys.path.insert(0, FREEZE_DIR)
    import importlib

    return importlib.import_module("model_low_freq")
