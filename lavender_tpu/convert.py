"""PyTorch checkpoint -> flax params converter.

Converts the reference's released ``.pt`` state dicts (LAVENDER / VIOLET /
SwinBERT key layouts, see model.py:352-473 and video_swin.py:482-533,648-654)
into the nested param pytrees of :mod:`lavender_tpu.models`.

The flax module tree intentionally mirrors the torch module paths, so the
conversion is a mechanical rewrite:

* ``a.b.3.c`` -> ``a/b_3/c`` (indexed submodules)
* Linear ``weight`` (2-D) -> ``kernel`` transposed; Conv3d ``weight`` (5-D) ->
  ``kernel`` with layout OIDHW -> DHWIO; LayerNorm ``weight`` (1-D) ->
  ``scale``; ``*_embeddings.weight`` -> ``embedding`` (untransposed).
* buffers (``relative_position_index``, ``attn_mask``, ``position_ids``) are
  dropped — they are recomputed at trace time.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

# torch module paths whose 2-D `weight` is an nn.Embedding, not nn.Linear
_EMBEDDING_MODULES = (
    "word_embeddings", "position_embeddings", "token_type_embeddings",
)

_DROP_PATTERNS = (
    "relative_position_index", "attn_mask", "position_ids",
)

# HF sub-path flattenings used by our flax modules (see models/bert.py)
_REWRITES = (
    # BertLayer: intermediate.dense / output.dense / output.LayerNorm flattening
    (re.compile(r"(layer_\d+)/intermediate/dense/"), r"\1/intermediate_dense/"),
    (re.compile(r"(layer_\d+)/output/dense/"), r"\1/output_dense/"),
    (re.compile(r"(layer_\d+)/output/LayerNorm/"), r"\1/output_LayerNorm/"),
    # BertOnlyMLMHead (cls.predictions.* or fc_mtm.predictions.*)
    (re.compile(r"predictions/transform/dense/"), r"transform_dense/"),
    (re.compile(r"predictions/transform/LayerNorm/"), r"transform_LayerNorm/"),
    (re.compile(r"predictions/decoder/"), r"decoder/"),
    # task-specific nn.Sequential heads: fc.1 / fc.3 (Dropout,Linear,ReLU,
    # Linear) -> fc/fc1, fc/fc2 (see models/heads.py MLPHead)
    (re.compile(r"(^|/)(fc[\w]*)_1/"), r"\1\2/fc1/"),
    (re.compile(r"(^|/)(fc[\w]*)_3/"), r"\1\2/fc2/"),
)


def to_numpy_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Detach a torch state_dict to plain numpy arrays."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _map_key(key: str, value: np.ndarray):
    """Map one torch key to (slash path, converted array) or (None, None)."""
    if any(p in key for p in _DROP_PATTERNS):
        return None, None
    parts = key.split(".")
    name = parts[-1]
    mods: list = []
    for p in parts[:-1]:
        if p.isdigit() and mods:
            mods[-1] = f"{mods[-1]}_{p}"
        else:
            mods.append(p)
    leaf_module = mods[-1] if mods else ""

    if name == "weight":
        if value.ndim == 1:
            name = "scale"  # LayerNorm
        elif value.ndim == 2:
            if leaf_module in _EMBEDDING_MODULES:
                name = "embedding"
            else:
                name = "kernel"
                value = value.T
        elif value.ndim == 5:  # Conv3d OIDHW -> DHWIO
            name = "kernel"
            value = value.transpose(2, 3, 4, 1, 0)
        else:
            name = "kernel"
    path = "/".join(mods + [name]) if mods else name
    for pat, repl in _REWRITES:
        path = pat.sub(repl, path)
    return path, value


def _insert(tree: Dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert_state_dict(state_dict: Mapping[str, Any],
                       strip_prefix: str = "") -> Dict:
    """Convert a (sub-)state dict to a nested flax param tree.

    ``strip_prefix`` selects and strips a torch key prefix, e.g.
    ``"bert.encoder."`` to convert just the fusion encoder.
    """
    sd = to_numpy_state_dict(state_dict)
    # MLM-head tied bias: prefer decoder.bias; synthesize it from
    # predictions.bias when absent (reference does the reverse remap at
    # model.py:470).
    keys = list(sd.keys())
    for k in keys:
        if k.endswith("predictions.bias"):
            dec = k[: -len("bias")] + "decoder.bias"
            if dec not in sd:
                sd[dec] = sd[k]
            del sd[k]
    tree: Dict = {}
    for k, v in sd.items():
        if strip_prefix:
            if not k.startswith(strip_prefix):
                continue
            k = k[len(strip_prefix):]
        path, val = _map_key(k, v)
        if path is None:
            continue
        _insert(tree, path, val)
    return tree


def convert_lavender_checkpoint(state_dict: Mapping[str, Any],
                                max_size_frame: Optional[int] = None,
                                max_size_patch: Optional[int] = None) -> Dict:
    """Convert a full LAVENDER ``ckpt_violet_*.pt`` state dict.

    Handles the emb_len / emb_pos truncate-or-pad tolerance of the reference
    loader (model.py:406-429): if the target sizes are larger than the
    checkpoint's, the loaded rows are placed at the front (the remainder keeps
    converted-checkpoint values absent -> caller should merge with init).
    """
    tree = convert_state_dict(state_dict)
    enc_img = tree.get("enc_img", {})
    if max_size_frame is not None and "emb_len" in enc_img:
        cur = enc_img["emb_len"]
        if cur.shape[1] > max_size_frame:
            enc_img["emb_len"] = cur[:, :max_size_frame]
    if max_size_patch is not None and "emb_pos" in enc_img:
        cur = enc_img["emb_pos"]
        want = 1 + max_size_patch ** 2
        if cur.shape[2] > want:
            enc_img["emb_pos"] = cur[:, :, :want]
    return tree


def merge_params(init_params: Dict, loaded: Dict, path: str = "") -> Dict:
    """Recursively overlay ``loaded`` onto ``init_params``.

    Mirrors the reference's tolerant loader (model.py:370-405): keys missing
    from the checkpoint keep their init values; shape-mismatched leaves are
    partially copied when the loaded array is a prefix slice (emb_len/emb_pos
    truncate-or-pad, model.py:406-429), otherwise kept at init.
    Returns a new tree; logs nothing (caller can diff if needed).
    """
    out = {}
    for k, v in init_params.items():
        if k not in loaded:
            out[k] = v
            continue
        lv = loaded[k]
        if isinstance(v, dict):
            out[k] = merge_params(v, lv, f"{path}/{k}")
        else:
            v = np.asarray(v)
            lv = np.asarray(lv)
            if v.shape == lv.shape:
                out[k] = lv.astype(v.dtype)
            elif lv.ndim == v.ndim and all(
                    ls <= s for ls, s in zip(lv.shape, v.shape)):
                nv = np.array(v)
                nv[tuple(slice(0, s) for s in lv.shape)] = lv
                out[k] = nv.astype(v.dtype)
            else:
                out[k] = v  # incompatible; keep init (reference skips too)
    return out


def swin_to_scan_layout(swin_params: Dict, depths) -> Dict:
    """Per-block stage layout -> scan layout (SwinConfig.scan_blocks).

    ``layers_{i}/blocks_{2k}`` / ``blocks_{2k+1}`` become
    ``layers_{i}/blocks_scan/a`` / ``b`` with params stacked over the pair
    axis k.  Stages with odd depth are left as-is (the model falls back to
    the unrolled path for them).
    """
    import jax

    out = dict(swin_params)
    for i, depth in enumerate(depths):
        layer_key = f"layers_{i}"
        if layer_key not in out or depth % 2 != 0:
            continue
        layer = dict(out[layer_key])
        if f"blocks_0" not in layer:
            continue
        n_pairs = depth // 2
        evens = [layer.pop(f"blocks_{2 * k}") for k in range(n_pairs)]
        odds = [layer.pop(f"blocks_{2 * k + 1}") for k in range(n_pairs)]
        stack = lambda trees: jax.tree_util.tree_map(
            lambda *xs: np.stack(xs, axis=0), *trees)
        layer["blocks_scan"] = {"a": stack(evens), "b": stack(odds)}
        out[layer_key] = layer
    return out


def lavender_to_scan_layout(params: Dict, depths) -> Dict:
    """Apply swin_to_scan_layout to a full LAVENDER tree (enc_img/swin)."""
    out = dict(params)
    if "enc_img" in out and "swin" in out["enc_img"]:
        enc = dict(out["enc_img"])
        enc["swin"] = swin_to_scan_layout(enc["swin"], depths)
        out["enc_img"] = enc
    return out


def match_scan_layout(loaded: Dict, init_params: Dict) -> Dict:
    """Restack a per-block converted ``.pt`` tree to scan layout wherever
    the target (init) tree uses it.

    With ``SwinConfig.scan_blocks`` default-on, init trees carry
    ``layers_i/blocks_scan/{a,b}`` while ``convert_lavender_checkpoint``
    emits per-block ``layers_i/blocks_k`` — ``merge_params`` would silently
    keep every swin block at init.  Depths are inferred from the loaded
    per-block keys; stages whose init layer has no ``blocks_scan`` (odd
    depth: the model unrolls them) are left per-block."""
    init_swin = init_params.get("enc_img", {}).get("swin")
    loaded_swin = loaded.get("enc_img", {}).get("swin")
    if not isinstance(init_swin, dict) or not isinstance(loaded_swin, dict):
        return loaded
    depths = []
    i = 0
    while f"layers_{i}" in init_swin:
        layer = loaded_swin.get(f"layers_{i}")
        if ("blocks_scan" in init_swin[f"layers_{i}"]
                and isinstance(layer, dict)):
            n = 0
            while f"blocks_{n}" in layer:
                n += 1
            depths.append(n)
        else:
            depths.append(1)  # swin_to_scan_layout skips odd depths
        i += 1
    return lavender_to_scan_layout(loaded, depths)


def _cubic_weights(t: np.ndarray, a: float = -0.75):
    """Per-sample 4-tap cubic convolution weights (torch bicubic, A=-0.75)."""
    def conv1(x):
        return ((a + 2) * x - (a + 3)) * x * x + 1
    def conv2(x):
        return ((a * x - 5 * a) * x + 8 * a) * x - 4 * a
    return np.stack([conv2(t + 1), conv1(t), conv1(1 - t), conv2(2 - t)],
                    axis=-1)


def _bicubic_resize(grid: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bicubic resize of ``grid [..., H, W]`` matching
    ``torch.nn.functional.interpolate(mode='bicubic',
    align_corners=False)`` (edge-clamped 4-tap cubic convolution)."""
    def axis_resize(x, out_n):  # resample last axis
        in_n = x.shape[-1]
        src = (np.arange(out_n) + 0.5) * (in_n / out_n) - 0.5
        i0 = np.floor(src).astype(np.int64)
        t = src - i0
        w = _cubic_weights(t)  # [out_n, 4]
        taps = np.stack([np.clip(i0 + d - 1, 0, in_n - 1) for d in range(4)],
                        axis=-1)  # [out_n, 4]
        return np.einsum("...nk,nk->...n", x[..., taps], w)

    out = axis_resize(grid.astype(np.float64), out_w)
    out = axis_resize(np.swapaxes(out, -1, -2), out_h)
    return np.swapaxes(out, -1, -2).astype(grid.dtype)


def inflate_swin2d_state_dict(sd: Mapping[str, Any],
                              window_size: Tuple[int, int, int],
                              patch_size_t: int) -> Dict[str, np.ndarray]:
    """2D Swin -> 3D Video Swin weight inflation (the reference's
    ``inflate_weights``, video_swin.py:482-533).

    * ``patch_embed.proj.weight`` [O, I, kh, kw] is repeated over a new
      temporal axis of length ``patch_size_t`` and divided by it (:506);
    * each ``relative_position_bias_table`` [L1, nH] is bicubic-resized to
      the 3D spatial window when sizes differ (:509-524) and tiled
      ``2*wd - 1`` times over the temporal relative offsets (:527);
    * ``relative_position_index`` / ``attn_mask`` buffers are dropped
      (:496-504) — recomputed at trace time here anyway.
    """
    out = {}
    for k, v in to_numpy_state_dict(sd).items():
        if "relative_position_index" in k or "attn_mask" in k:
            continue
        out[k] = v
    pe = out.get("patch_embed.proj.weight")
    if pe is not None and pe.ndim == 4:
        out["patch_embed.proj.weight"] = (
            np.repeat(pe[:, :, None], patch_size_t, axis=2) / patch_size_t)
    wd, wh, ww = window_size
    th, tw = 2 * wh - 1, 2 * ww - 1
    for k in [k for k in out if "relative_position_bias_table" in k]:
        table = out[k]
        L1, nH = table.shape
        if L1 != th * tw:
            S1 = int(round(L1 ** 0.5))
            grid = table.T.reshape(nH, S1, S1)
            table = _bicubic_resize(grid, th, tw).reshape(nH, th * tw).T
        out[k] = np.tile(table, (2 * wd - 1, 1))
    return out


def convert_swin2d_checkpoint(sd: Mapping[str, Any], swin_cfg,
                              ) -> Dict:
    """Convert an ImageNet 2D Swin checkpoint ('model' state dict) to a
    flax VideoSwin3D param tree via inflation (video_swin.py:571-645 selects
    this path when ``pretrained2d``)."""
    if isinstance(sd, dict) and "model" in sd and isinstance(
            sd["model"], dict):
        sd = sd["model"]
    inflated = inflate_swin2d_state_dict(
        sd, tuple(swin_cfg.window_size), int(swin_cfg.patch_size[0]))
    return convert_state_dict(inflated)


def remap_swinbert_keys(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """SwinBERT checkpoint key remap (reference load_SwinBERT_weight,
    model.py:431-473): swin.backbone->enc_img.swin, trans_encoder.bert.*
    -> trsfr / enc_txt.emb_txt / enc_img.img_embedding, trans_encoder.cls
    -> fc_mtm, fc.-> enc_img.fc.; everything else dropped."""
    out: Dict[str, Any] = {}
    for key, val in sd.items():
        if "swin.backbone" in key:
            out[key.replace("swin.backbone", "enc_img.swin")] = val
        elif "trans_encoder.bert.encoder" in key:
            out[key.replace("trans_encoder.bert.encoder", "trsfr")] = val
        elif "trans_encoder.bert.embeddings" in key:
            out[key.replace("trans_encoder.bert.embeddings",
                            "enc_txt.emb_txt")] = val
        elif "trans_encoder.bert.img_embedding" in key:
            out[key.replace("trans_encoder.bert.img_embedding",
                            "enc_img.img_embedding")] = val
        elif key.startswith("trans_encoder.cls."):
            out[key.replace("trans_encoder.cls.", "fc_mtm.")] = val
        elif key.startswith("fc."):
            out[key.replace("fc.", "enc_img.fc.")] = val
    # fake the decoder bias from the tied predictions bias (model.py:470)
    if ("fc_mtm.predictions.bias" in out
            and "fc_mtm.predictions.decoder.bias" not in out):
        out["fc_mtm.predictions.decoder.bias"] = out[
            "fc_mtm.predictions.bias"]
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pt`` file to a numpy state dict (requires torch)."""
    import torch  # local import: torch is a conversion-time-only dependency
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = {k.replace("backbone.", ""): v for k, v in sd["state_dict"].items()}
    elif isinstance(sd, dict) and "model" in sd and all(
            not hasattr(v, "shape") for v in [sd.get("model")]):
        sd = sd["model"]
    return to_numpy_state_dict(sd)
