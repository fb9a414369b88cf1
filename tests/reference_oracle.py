"""Import the PyTorch reference (read-only, /root/reference) as a test oracle.

The reference has unresolvable imports in this image (deepspeed, fairscale,
addict, easydict, skimage, torchvision); we install minimal stand-in modules
so that the *model code paths we test* import.  This file contains NO
reference logic — only import shims.
"""
import sys
import types

REFERENCE_ROOT = "/root/reference"


class _AttrDict(dict):
    """Minimal dict-with-attribute-access (stand-in for addict/easydict)."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        if isinstance(v, dict) and not isinstance(v, _AttrDict):
            v = _AttrDict(v)
        return v

    def __setattr__(self, k, v):
        self[k] = v


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    import importlib.machinery
    mod = types.ModuleType(name)
    # a real-looking spec so importlib.util.find_spec() users (transformers'
    # integration probes) don't choke on __spec__ is None
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_shims():
    _stub("addict", Dict=_AttrDict)
    yapf = _stub("yapf")
    _stub("yapf.yapflib")
    _stub("yapf.yapflib.yapf_api", FormatCode=lambda s, **k: (s, True))
    yapf.yapflib = sys.modules["yapf.yapflib"]
    yapf.yapflib.yapf_api = sys.modules["yapf.yapflib.yapf_api"]
    _stub("easydict", EasyDict=_AttrDict)
    skimage = _stub("skimage")
    _stub("skimage.feature", hog=lambda *a, **k: None)
    skimage.feature = sys.modules["skimage.feature"]
    fairscale = _stub("fairscale")
    _stub("fairscale.nn")
    _stub("fairscale.nn.misc", checkpoint_wrapper=lambda m, **k: m)
    fairscale.nn = sys.modules["fairscale.nn"]
    fairscale.nn.misc = sys.modules["fairscale.nn.misc"]
    _stub("deepspeed", initialize=None)
    tv = _stub("torchvision", transforms=types.SimpleNamespace())
    _stub("torchvision.transforms")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def import_reference_video_swin():
    install_shims()
    from visbackbone import video_swin  # noqa: deferred import of oracle
    return video_swin


def import_reference_model():
    install_shims()
    import model  # noqa: reference model.py
    return model
