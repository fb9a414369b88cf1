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
    skimage.__path__ = []  # mark as package so submodule imports resolve
    _stub("skimage.feature", hog=lambda *a, **k: None)
    skimage.feature = sys.modules["skimage.feature"]
    _stub("skimage.transform", resize=lambda *a, **k: None)
    skimage.transform = sys.modules["skimage.transform"]
    _stub("progressbar", ProgressBar=lambda *a, **k: None)
    future = _stub("future")
    future.__path__ = []
    _stub("future.utils", viewitems=lambda d: d.items())
    future.utils = sys.modules["future.utils"]
    _stub("ete3", Tree=object)
    _stub("deprecated", deprecated=lambda *a, **k: (
        a[0] if a and callable(a[0]) else (lambda f: f)))
    fairscale = _stub("fairscale")
    _stub("fairscale.nn")
    _stub("fairscale.nn.misc", checkpoint_wrapper=lambda m, **k: m)
    fairscale.nn = sys.modules["fairscale.nn"]
    fairscale.nn.misc = sys.modules["fairscale.nn.misc"]
    _stub("deepspeed", initialize=None)
    tv = _stub("torchvision", transforms=types.SimpleNamespace())
    _stub("torchvision.transforms")
    _install_torchvision_transforms()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def _install_torchvision_transforms():
    """Faithful PIL-backed stand-ins for the torchvision transforms the
    reference dataset calls (dataset.py:107-175): Resize (shorter-side,
    PIL bilinear), CenterCrop (round-half-up offsets), ToTensor (CHW /255),
    Normalize, Pad, Compose.  torchvision is absent from this image; these
    reproduce its PIL-backend math exactly so the reference data pipeline
    can run as an end-to-end oracle."""
    import numpy as np
    import torch
    from PIL import Image

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class Resize:
        def __init__(self, size):
            self.size = size

        def __call__(self, img):
            if isinstance(self.size, int):
                w, h = img.size
                short, long = (w, h) if w <= h else (h, w)
                if short == self.size:
                    return img
                ns, nl = self.size, int(self.size * long / short)
                nw, nh = (ns, nl) if w <= h else (nl, ns)
                return img.resize((nw, nh), Image.BILINEAR)
            h, w = self.size
            return img.resize((w, h), Image.BILINEAR)

    class CenterCrop:
        def __init__(self, size):
            self.th, self.tw = (size, size) if isinstance(size, int) else size

        def __call__(self, img):
            w, h = img.size
            left = int(round((w - self.tw) / 2.0))
            top = int(round((h - self.th) / 2.0))
            return img.crop((left, top, left + self.tw, top + self.th))

    class Pad:
        def __init__(self, padding):
            self.padding = padding

        def __call__(self, img):
            pl, pt = self.padding
            w, h = img.size
            out = Image.new(img.mode, (w + 2 * pl, h + 2 * pt), 0)
            out.paste(img, (pl, pt))
            return out

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, dtype=np.float32) / 255.0
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    ns = sys.modules["torchvision"].transforms
    for cls in (Compose, Resize, CenterCrop, Pad, ToTensor, Normalize):
        setattr(ns, cls.__name__, cls)
    sys.modules["torchvision.transforms"].__dict__.update(
        Compose=Compose, Resize=Resize, CenterCrop=CenterCrop, Pad=Pad,
        ToTensor=ToTensor, Normalize=Normalize)


def import_reference_video_swin():
    install_shims()
    from visbackbone import video_swin  # noqa: deferred import of oracle
    return video_swin


def import_reference_model():
    install_shims()
    import model  # noqa: reference model.py
    return model
