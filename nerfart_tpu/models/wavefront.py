"""Wavefront (two-stage) VolSDF rendering: skip upsample iterations for
converged rays.

The error-bounded sampler is uniform-work under SPMD: every ray pays all
`max_upsample_steps` iterations even though most rays of a trained scene
converge after 0-2 (the reference exits per-ray on the host,
volsdf.py:184-289; the jit version masks instead). This module restores
per-ray adaptivity at the HOST level:

  stage 1: render everything with a small iteration budget and
           detailed_output, reading back only `iter_usage`;
  stage 2: re-render exactly the rays stage 1 left unconverged
           (iter_usage == -1) with the full budget, padded to a
           power-of-two bucket (bounded recompile count), and scatter the
           results over stage 1's.

Exactness: the sampler is deterministic given (rays, params, det
sampling), and a full-budget run's first `k` iterations coincide with a
k-budget run. Rays converged in stage 1 therefore already have their
final values; rays re-run in stage 2 reproduce exactly what a single
full-budget run would have produced. (With perturb=True the RNG streams
differ between stages — training uses the plain renderer anyway.)
"""
import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from nerfart_tpu.models import volsdf as volsdf_fw


def _next_pow2(n: int, floor: int = 256) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


def wavefront_render(params, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                     mcfg: volsdf_fw.VolSDFCfg,
                     rcfg: volsdf_fw.VolSDFRenderCfg,
                     stage1_steps: int = 1,
                     key: Optional[jax.Array] = None,
                     min_bucket: int = 1024,
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """Adaptive-depth render. rays_* [N, 3] (flat). Returns the same
    (rgb, depth, extras) surface as volume_render with detailed extras
    limited to the per-ray ones (per-sample extras differ in shape between
    stages and are omitted)."""
    assert not rcfg.perturb, \
        "wavefront mode targets deterministic eval renders"
    rcfg1 = dataclasses.replace(rcfg, max_upsample_steps=stage1_steps,
                                detailed_output=True)
    render = jax.jit(volsdf_fw.volume_render,
                     static_argnames=("mcfg", "rcfg"))
    rgb, depth, extras = render(params, rays_o, rays_d, mcfg=mcfg,
                                rcfg=rcfg1, key=key)
    usage = np.asarray(extras["iter_usage"]).reshape(-1)
    unconv = np.nonzero(usage < 0)[0]

    per_ray_keys = ["rgb", "depth_volume", "mask_volume", "beta_map",
                    "iter_usage"]
    if "normals_volume" in extras:
        per_ray_keys.append("normals_volume")
    # np.asarray over jax arrays is read-only; copy for in-place scatter
    out = {k: np.array(extras[k]) for k in per_ray_keys if k in extras}
    out["rgb"] = np.array(rgb)
    out["depth_volume"] = np.array(depth)

    if len(unconv) > 0:
        bucket = _next_pow2(len(unconv), min_bucket)
        sel = np.zeros(bucket, np.int64)
        sel[:len(unconv)] = unconv
        ro2 = jnp.asarray(np.asarray(rays_o).reshape(-1, 3)[sel])
        rd2 = jnp.asarray(np.asarray(rays_d).reshape(-1, 3)[sel])
        rcfg2 = dataclasses.replace(rcfg, detailed_output=True)
        rgb2, depth2, ex2 = render(params, ro2, rd2, mcfg=mcfg,
                                   rcfg=rcfg2, key=key)
        n = len(unconv)
        out["rgb"][unconv] = np.asarray(rgb2)[:n]
        out["depth_volume"][unconv] = np.asarray(depth2)[:n]
        for k in per_ray_keys:
            if k in out and k in ex2 and k not in ("rgb", "depth_volume"):
                out[k][unconv] = np.asarray(ex2[k])[:n]

    return out["rgb"], out["depth_volume"], out
