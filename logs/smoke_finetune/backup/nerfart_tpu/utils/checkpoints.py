"""Checkpoint IO: save/load param+optimizer pytrees, with .pt interop.

Reproduces the reference's CheckpointIO surface (reference
utils/checkpoints.py:10-159): a module registry, `save` with extra scalars,
`load_file` with `ignore_keys` / `only_use_keys` filters and automatic
latest-checkpoint selection ordered numbered < latest < final
(checkpoints.py:139-159).

Native format: a single .npz of flattened pytree leaves (fast, portable,
torch-free). Reference .pt checkpoints load transparently via
utils/torch_convert.py when the path ends in .pt.
"""
import glob
import os
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}#/"))
    elif tree is None:
        out[prefix[:-1] + "::none"] = np.zeros(())
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        if key.endswith("::none"):
            key, val = key[:-len("::none")], None
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def fix(node):
        if isinstance(node, dict):
            if node and all(k.endswith("#") for k in node):
                items = sorted(node.items(), key=lambda kv: int(kv[0][:-1]))
                return [fix(v) for _, v in items]
            return {k: fix(v) for k, v in node.items()}
        return node

    return fix(root)


def save_checkpoint(path: str, **trees: Any):
    """Save named pytrees (+ scalars) into one .npz."""
    flat: Dict[str, np.ndarray] = {}
    for name, tree in trees.items():
        flat.update(_flatten(tree, f"{name}/") if isinstance(
            tree, (dict, list, tuple)) else {name: np.asarray(tree)})
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load an .npz checkpoint back into {name: pytree}."""
    flat = dict(np.load(path, allow_pickle=False))
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    scalars: Dict[str, Any] = {}
    for k, v in flat.items():
        if "/" in k:
            name, rest = k.split("/", 1)
            groups.setdefault(name, {})[rest] = v
        else:
            scalars[k] = v
    out: Dict[str, Any] = dict(scalars)
    for name, g in groups.items():
        out[name] = _unflatten(g)
    return out


def sorted_ckpts(ckpt_dir: str) -> List[str]:
    """Order: numbered (ascending) < latest < final (checkpoints.py:139-159)."""
    paths = glob.glob(os.path.join(ckpt_dir, "*.npz")) \
        + glob.glob(os.path.join(ckpt_dir, "*.pt"))

    def rank(p):
        b = os.path.basename(p)
        if b.startswith("final"):
            return (2, 0)
        if b.startswith("latest"):
            return (1, 0)
        m = re.match(r"(\d+)\.", b)
        return (0, int(m.group(1)) if m else -1)

    return sorted(paths, key=rank)


class CheckpointIO:
    """Module registry + periodic save/load (reference checkpoints.py:10-131)."""

    def __init__(self, checkpoint_dir: str = "./chkpts", allow_mkdir: bool = True):
        self.checkpoint_dir = checkpoint_dir
        if allow_mkdir:
            os.makedirs(checkpoint_dir, exist_ok=True)
        self.module_dict: Dict[str, Any] = {}

    def register_modules(self, **kwargs):
        """Register pytrees (params, opt_state, ...) to save. Values may be
        pytrees or zero-arg callables returning a pytree (live handles)."""
        self.module_dict.update(kwargs)

    def save(self, filename: str, **scalars):
        if not os.path.isabs(filename):
            filename = os.path.join(self.checkpoint_dir, filename)
        if filename.endswith(".pt"):
            filename = filename[:-3] + ".npz"
        trees = {k: (v() if callable(v) else v)
                 for k, v in self.module_dict.items()}
        trees = jax.tree_util.tree_map(np.asarray, trees)
        save_checkpoint(filename, **trees, **scalars)
        return filename

    def load_file(self, filename: Optional[str] = None,
                  ignore_keys: Optional[List[str]] = None,
                  only_use_keys: Optional[List[str]] = None,
                  framework: str = "volsdf") -> Dict[str, Any]:
        """Load a checkpoint; None/'None' auto-picks the newest in
        checkpoint_dir (checkpoints.py:59-102)."""
        if filename is None or filename in ("None", ""):
            found = sorted_ckpts(self.checkpoint_dir)
            if not found:
                print("=> No previous checkpoints found; training from scratch.")
                return {}
            filename = found[-1]
        elif not os.path.isabs(filename) and not os.path.exists(filename):
            filename = os.path.join(self.checkpoint_dir, filename)

        print(f"=> Loading checkpoint from local file: {filename}")
        if filename.endswith(".pt"):
            blob = self._load_pt(filename, framework)
        else:
            blob = load_checkpoint(filename)

        assert not (ignore_keys and only_use_keys), \
            "iterable of ignore_keys and only_use_keys are mutually exclusive"
        if ignore_keys:
            blob = {k: v for k, v in blob.items() if k not in ignore_keys}
        if only_use_keys:
            if isinstance(only_use_keys, str):
                only_use_keys = [only_use_keys]
            blob = {k: v for k, v in blob.items() if k in only_use_keys}
        return blob

    @staticmethod
    def _load_pt(filename: str, framework: str) -> Dict[str, Any]:
        from nerfart_tpu.utils import torch_convert
        params = torch_convert.load_torch_pt(filename, framework)
        import torch
        raw = torch.load(filename, map_location="cpu", weights_only=False)
        out: Dict[str, Any] = {"model": params}
        for k in ("global_step", "epoch_idx"):
            if isinstance(raw, dict) and k in raw:
                out[k] = raw[k]
        return out
