"""Checkpoint conversion between the reference's PyTorch .pt layout and
nerfart_tpu param pytrees.

The reference saves `{'model': state_dict, 'optimizer': ..., 'global_step',
'epoch_idx'}` via torch.save (reference utils/checkpoints.py:33-46) with
weight-normed linears stored as `weight_g` / `weight_v` (base.py:226-227).

This module works from a flat `{name: np.ndarray}` dict so it has no hard
torch dependency; `load_torch_pt` wraps torch.load when torch is available.
"""
import re
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


def _layer_from(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, jnp.ndarray]:
    p: Dict[str, jnp.ndarray] = {}
    if f"{prefix}.weight_v" in sd:
        p["v"] = jnp.asarray(sd[f"{prefix}.weight_v"])
        g = np.asarray(sd[f"{prefix}.weight_g"])
        p["g"] = jnp.asarray(g.reshape(g.shape[0], 1))
        # zero-norm rows (geometric init zeroes whole octave columns but not
        # rows; guard anyway)
    elif f"{prefix}.weight" in sd:
        p["w"] = jnp.asarray(sd[f"{prefix}.weight"])
    else:
        raise KeyError(f"no weight for layer {prefix}")
    p["b"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def _count_layers(sd: Dict[str, np.ndarray], pattern: str) -> int:
    idxs = set()
    rx = re.compile(pattern)
    for k in sd:
        m = rx.match(k)
        if m:
            idxs.add(int(m.group(1)))
    return (max(idxs) + 1) if idxs else 0


def implicit_surface_from_torch(sd: Dict[str, np.ndarray], prefix: str = "") -> Any:
    n = _count_layers(sd, re.escape(prefix) + r"surface_fc_layers\.(\d+)\.")
    return {"layers": [_layer_from(sd, f"{prefix}surface_fc_layers.{l}")
                       for l in range(n)]}


def radiance_net_from_torch(sd: Dict[str, np.ndarray], prefix: str = "") -> Any:
    n = _count_layers(sd, re.escape(prefix) + r"layers\.(\d+)\.")
    return {"layers": [_layer_from(sd, f"{prefix}layers.{l}") for l in range(n)]}


def nerf_from_torch(sd: Dict[str, np.ndarray], prefix: str = "",
                    use_view_dirs: bool = True) -> Any:
    n_pts = _count_layers(sd, re.escape(prefix) + r"pts_linears\.(\d+)\.")
    n_views = _count_layers(sd, re.escape(prefix) + r"views_linears\.(\d+)\.")
    params = {
        "pts": [_layer_from(sd, f"{prefix}pts_linears.{i}") for i in range(n_pts)],
        "views": [_layer_from(sd, f"{prefix}views_linears.{i}") for i in range(n_views)],
    }
    if use_view_dirs:
        params["feature"] = _layer_from(sd, f"{prefix}feature_linear")
        params["alpha"] = _layer_from(sd, f"{prefix}alpha_linear")
        params["rgb"] = _layer_from(sd, f"{prefix}rgb_linear")
    else:
        params["output"] = _layer_from(sd, f"{prefix}output_linear")
    return params


def model_params_from_torch(sd: Dict[str, np.ndarray], framework: str) -> Any:
    """Full VolSDF / NeuS / UNISURF params from a reference model state_dict."""
    params: Dict[str, Any] = {
        "implicit_surface": implicit_surface_from_torch(sd, "implicit_surface."),
        "radiance_net": radiance_net_from_torch(sd, "radiance_net."),
    }
    fw = framework.lower()
    if fw == "volsdf":
        params["ln_beta"] = jnp.asarray(sd["ln_beta"]).reshape(1)
    elif fw == "neus":
        params["ln_s"] = jnp.asarray(sd["ln_s"]).reshape(1)
    if any(k.startswith("nerf_outside.") for k in sd):
        params["nerf_outside"] = nerf_from_torch(sd, "nerf_outside.",
                                                 use_view_dirs=True)
    return params


def model_params_to_torch(params: Any, framework: str) -> Dict[str, np.ndarray]:
    """Inverse of model_params_from_torch (for exporting back to .pt layout)."""
    sd: Dict[str, np.ndarray] = {}

    def put_layer(prefix, p):
        if "v" in p:
            sd[f"{prefix}.weight_g"] = np.asarray(p["g"])
            sd[f"{prefix}.weight_v"] = np.asarray(p["v"])
        else:
            sd[f"{prefix}.weight"] = np.asarray(p["w"])
        sd[f"{prefix}.bias"] = np.asarray(p["b"])

    for l, p in enumerate(params["implicit_surface"]["layers"]):
        put_layer(f"implicit_surface.surface_fc_layers.{l}", p)
    for l, p in enumerate(params["radiance_net"]["layers"]):
        put_layer(f"radiance_net.layers.{l}", p)
    fw = framework.lower()
    if fw == "volsdf" and "ln_beta" in params:
        sd["ln_beta"] = np.asarray(params["ln_beta"])
    if fw == "neus" and "ln_s" in params:
        sd["ln_s"] = np.asarray(params["ln_s"])
    if "nerf_outside" in params:
        bg = params["nerf_outside"]
        for i, p in enumerate(bg["pts"]):
            put_layer(f"nerf_outside.pts_linears.{i}", p)
        for i, p in enumerate(bg["views"]):
            put_layer(f"nerf_outside.views_linears.{i}", p)
        for name, key in [("feature_linear", "feature"), ("alpha_linear", "alpha"),
                          ("rgb_linear", "rgb"), ("output_linear", "output")]:
            if key in bg:
                put_layer(f"nerf_outside.{name}", bg[key])
    return sd


def save_torch_pt(params: Any, path: str, framework: str,
                  global_step: int = 0, epoch_idx: int = 0):
    """Export params back to the reference's .pt layout (torch required),
    so checkpoints trained here load in the PyTorch reference."""
    import torch

    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in model_params_to_torch(params, framework).items()}
    torch.save({"model": sd, "global_step": global_step,
                "epoch_idx": epoch_idx}, path)


def load_torch_pt(path: str, framework: str,
                  module_key: str = "model") -> Any:
    """Load a reference .pt checkpoint -> params pytree. Requires torch."""
    import torch  # local import; torch is only needed for .pt interop

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob[module_key] if module_key in blob else blob
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()
          if hasattr(v, "detach")}
    return model_params_from_torch(sd, framework)
