"""PyTorch checkpoint <-> flax variable conversion.

Covers the two checkpoint families the reference consumes:

  * pytorchvideo ``create_slowfast`` state_dicts — the Kinetics
    ``SLOWFAST_8x8_R50.pyth`` warm start and the reference's own ``.ckpt`` files
    (`/root/reference/train.py:113-123,198-214`). Key grammar:
    ``blocks.{i}.multipathway_blocks.{p}.(conv|norm|res_blocks.{j}.(branch1_conv|
    branch1_norm|branch2.(conv_a|norm_a|...)))`` plus
    ``blocks.{i}.multipathway_fusion.(conv_fast_to_slow|norm).0`` and
    ``blocks.6.proj``.
  * torchvision ``resnet50`` state_dicts (the res2d warm start, train.py:64-68).

Layout transforms: Conv3d OIDHW -> DHWIO, Conv2d OIHW -> HWIO, Linear (O,I) -> (I,O);
BN weight/bias -> scale/bias params, running_mean/var -> batch_stats mean/var;
``num_batches_tracked`` is dropped.

``delete_mismatch`` reproduces train.py:93-111: the 12 shape-mismatched keys removed
before loading the Kinetics warm start (stem convs, head projection, stage-0
branch1/conv_a of every stage — the layers whose input channel counts differ).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

# train.py:94-108, verbatim list.
MISMATCH_LAYERS = [
    "blocks.0.multipathway_blocks.0.conv.weight",
    "blocks.0.multipathway_blocks.1.conv.weight",
    "blocks.6.proj.weight",
    "blocks.6.proj.bias",
    "blocks.1.multipathway_blocks.0.res_blocks.0.branch1_conv.weight",
    "blocks.1.multipathway_blocks.0.res_blocks.0.branch2.conv_a.weight",
    "blocks.2.multipathway_blocks.0.res_blocks.0.branch1_conv.weight",
    "blocks.2.multipathway_blocks.0.res_blocks.0.branch2.conv_a.weight",
    "blocks.3.multipathway_blocks.0.res_blocks.0.branch1_conv.weight",
    "blocks.3.multipathway_blocks.0.res_blocks.0.branch2.conv_a.weight",
    "blocks.4.multipathway_blocks.0.res_blocks.0.branch1_conv.weight",
    "blocks.4.multipathway_blocks.0.res_blocks.0.branch2.conv_a.weight",
]


def delete_mismatch(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    for key in MISMATCH_LAYERS:
        state_dict.pop(key, None)
    return state_dict


_BN_PARAM = {"weight": "scale", "bias": "bias"}
_BN_STAT = {"running_mean": "mean", "running_var": "var"}

# res_unit Sequential indices (my_slowfast.py:228-236) -> flax module names.
_RES_UNIT_MAP = {"0": "res_unit_conv1", "2": "res_unit_norm1", "3": "res_unit_conv2",
                 "5": "res_unit_norm2", "6": "res_unit_conv3"}


def _convert_tensor(leaf: str, arr: np.ndarray) -> Tuple[str, np.ndarray]:
    """Returns (flax leaf name, transformed array) for a conv/linear/bn tensor."""
    if leaf == "weight":
        if arr.ndim == 5:  # Conv3d OIDHW -> DHWIO
            return "kernel", np.transpose(arr, (2, 3, 4, 1, 0))
        if arr.ndim == 4:  # Conv2d OIHW -> HWIO
            return "kernel", np.transpose(arr, (2, 3, 1, 0))
        if arr.ndim == 2:  # Linear (O, I) -> (I, O)
            return "kernel", np.transpose(arr, (1, 0))
        return "scale", arr  # 1-D: BN weight
    if leaf == "bias":
        return "bias", arr
    raise ValueError(f"unexpected leaf {leaf}")


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _slowfast_module_path(torch_key: str) -> Tuple[Tuple[str, ...], str] | None:
    """Map a torch module path (sans tensor leaf) to the flax module path."""
    parts = torch_key.split(".")
    leaf = parts[-1]
    mods = parts[:-1]

    if mods[0] != "blocks":
        return None
    i = mods[1]
    rest = mods[2:]

    if rest == ["proj"]:  # blocks.6.proj
        return ("head", "proj"), leaf

    if rest[0] == "multipathway_blocks":
        p = rest[1]
        sub = rest[2:]
        base = f"blocks_{i}_pathway_{p}"
        if sub == ["conv"] or sub == ["norm"]:  # stem
            return (base, sub[0]), leaf
        if sub[0] == "res_blocks":
            j = sub[1]
            tail = sub[2:]
            block = (base, f"res_block_{j}")
            if tail[0] in ("branch1_conv", "branch1_norm"):
                return block + (tail[0],), leaf
            if tail[0] == "branch2":
                return block + ("branch2", tail[1]), leaf
        return None

    if rest[0] == "multipathway_fusion":
        base = f"blocks_{i}_fuse"
        sub = rest[1:]
        if sub[:1] == ["conv_fast_to_slow"]:  # ModuleList index 0
            return (base, "conv_fast_to_slow"), leaf
        if sub[:1] == ["norm"]:
            return (base, "norm"), leaf
        if sub[:1] == ["residual"]:  # Sequential: 0 conv, 1 relu
            return (base, "residual_conv"), leaf
        if sub[:1] == ["res_unit"]:
            return (base, _RES_UNIT_MAP[sub[1]]), leaf
        return None
    return None


def _resnet2d_module_path(torch_key: str) -> Tuple[Tuple[str, ...], str] | None:
    parts = torch_key.split(".")
    leaf = parts[-1]
    mods = parts[:-1]
    if mods[0] in ("conv1", "bn1", "fc") and len(mods) == 1:
        return (mods[0],), leaf
    m = re.fullmatch(r"layer(\d)", mods[0])
    if m and len(mods) >= 3:
        j = mods[1]
        base = f"layer{m.group(1)}_{j}"
        sub = mods[2:]
        if sub[0] == "downsample":
            name = "downsample_conv" if sub[1] == "0" else "downsample_norm"
            return (base, name), leaf
        return (base, sub[0]), leaf
    return None


def torch_to_flax(
    state_dict: Dict[str, np.ndarray], arch: str = "slowfast"
) -> Dict[str, dict]:
    """Convert a torch state_dict to flax ``{'params':..., 'batch_stats':...}``.

    Keys with no flax counterpart (e.g. the fusion ``residual``/``res_unit``
    parameters when running the 'default' fusion forward, which never uses them —
    my_slowfast.py:334-344) are skipped, mirroring ``load_state_dict(strict=False)``.
    """
    path_fn = {"slowfast": _slowfast_module_path, "res2d": _resnet2d_module_path}[arch]
    variables: Dict[str, dict] = {"params": {}, "batch_stats": {}}
    for key, arr in state_dict.items():
        leaf = key.rsplit(".", 1)[-1]
        if leaf == "num_batches_tracked":
            continue
        arr = np.asarray(arr)
        mapped = path_fn(key)
        if mapped is None:
            continue
        mod_path, leaf = mapped
        if leaf in _BN_STAT:
            _set(variables["batch_stats"], mod_path + (_BN_STAT[leaf],), arr)
        elif _is_norm_module(mod_path):
            _set(variables["params"], mod_path + (_BN_PARAM[leaf],), arr)
        else:
            flax_leaf, out = _convert_tensor(leaf, arr)
            _set(variables["params"], mod_path + (flax_leaf,), out)
    return variables


def _is_norm_module(mod_path: Tuple[str, ...]) -> bool:
    last = mod_path[-1]
    return "norm" in last or last.startswith("bn")


def flax_to_torch(variables: Dict[str, dict], arch: str = "slowfast") -> Dict[str, np.ndarray]:
    """Inverse conversion for our own models (round-trip / export)."""

    out: Dict[str, np.ndarray] = {}

    def emit(torch_mod: str, flax_mod: dict, is_bn: bool):
        if is_bn:
            if "scale" in flax_mod:
                out[f"{torch_mod}.weight"] = np.asarray(flax_mod["scale"])
            if "bias" in flax_mod:
                out[f"{torch_mod}.bias"] = np.asarray(flax_mod["bias"])
            if "mean" in flax_mod:
                out[f"{torch_mod}.running_mean"] = np.asarray(flax_mod["mean"])
            if "var" in flax_mod:
                out[f"{torch_mod}.running_var"] = np.asarray(flax_mod["var"])
            return
        if "kernel" in flax_mod:
            k = np.asarray(flax_mod["kernel"])
            if k.ndim == 5:
                out[f"{torch_mod}.weight"] = np.transpose(k, (4, 3, 0, 1, 2))
            elif k.ndim == 4:
                out[f"{torch_mod}.weight"] = np.transpose(k, (3, 2, 0, 1))
            else:
                out[f"{torch_mod}.weight"] = np.transpose(k, (1, 0))
        if "bias" in flax_mod:
            out[f"{torch_mod}.bias"] = np.asarray(flax_mod["bias"])

    inv = _build_inverse_name_map(variables, arch)
    for flax_path, torch_mod in inv.items():
        node_p = _get(variables.get("params", {}), flax_path)
        node_s = _get(variables.get("batch_stats", {}), flax_path)
        if node_p is None and node_s is None:
            continue
        merged = {}
        if node_p:
            merged.update(node_p)
        if node_s:
            merged.update(node_s)
        is_bn = _is_norm_module(flax_path) or "mean" in merged or "scale" in merged
        emit(torch_mod, merged, is_bn)
    return out


def _get(tree: dict, path: Tuple[str, ...]):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def _build_inverse_name_map(variables, arch) -> Dict[Tuple[str, ...], str]:
    """Enumerate flax module paths in the variables and name their torch twins."""
    inv: Dict[Tuple[str, ...], str] = {}

    def walk(node: dict, path: Tuple[str, ...]):
        is_leaf_mod = any(k in node for k in ("kernel", "scale", "mean", "bias"))
        if is_leaf_mod:
            inv[path] = _flax_path_to_torch(path, arch)
            return
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + (k,))

    for coll in ("params", "batch_stats"):
        walk(variables.get(coll, {}), ())
    return {p: t for p, t in inv.items() if t is not None}


def _flax_path_to_torch(path: Tuple[str, ...], arch: str) -> str | None:
    if arch == "res2d":
        if len(path) == 1:
            return path[0]
        base, sub = path
        m = re.fullmatch(r"layer(\d)_(\d+)", base)
        if not m:
            return None
        prefix = f"layer{m.group(1)}.{m.group(2)}"
        if sub == "downsample_conv":
            return f"{prefix}.downsample.0"
        if sub == "downsample_norm":
            return f"{prefix}.downsample.1"
        return f"{prefix}.{sub}"

    # slowfast
    if path[0] == "head":
        return "blocks.6.proj"
    m = re.fullmatch(r"blocks_(\d)_pathway_(\d)", path[0])
    if m:
        prefix = f"blocks.{m.group(1)}.multipathway_blocks.{m.group(2)}"
        if len(path) == 2:  # stem conv / norm
            return f"{prefix}.{path[1]}"
        rb = re.fullmatch(r"res_block_(\d+)", path[1])
        if rb:
            prefix = f"{prefix}.res_blocks.{rb.group(1)}"
            if path[2] in ("branch1_conv", "branch1_norm"):
                return f"{prefix}.{path[2]}"
            if path[2] == "branch2":
                return f"{prefix}.branch2.{path[3]}"
        return None
    m = re.fullmatch(r"blocks_(\d)_fuse", path[0])
    if m:
        prefix = f"blocks.{m.group(1)}.multipathway_fusion"
        sub = path[1]
        if sub == "conv_fast_to_slow":
            return f"{prefix}.conv_fast_to_slow.0"
        if sub == "norm":
            return f"{prefix}.norm.0"
        if sub == "residual_conv":
            return f"{prefix}.residual.0"
        for k, v in _RES_UNIT_MAP.items():
            if v == sub:
                return f"{prefix}.res_unit.{k}"
    return None
