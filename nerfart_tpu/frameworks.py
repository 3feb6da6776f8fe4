"""Framework dispatch (reference models/frameworks/__init__.py:1-11).

`get_model(args)` selects VolSDF / NeuS / UNISURF from
`args.model.framework` and returns a bundle with the model config, an
init function, the volume-render entry point, and reference-equivalent
train/test render configs. (The reference raises NotImplementedError for
UNISURF in dispatch; here it is wired, since the framework exists.)
"""
import dataclasses
from typing import Any, Callable, Dict

import jax

from nerfart_tpu.models import neus as neus_fw
from nerfart_tpu.models import unisurf as unisurf_fw
from nerfart_tpu.models import volsdf as volsdf_fw


@dataclasses.dataclass
class FrameworkBundle:
    name: str
    mcfg: Any
    init_params: Callable[[jax.Array], Any]
    volume_render: Callable
    render_cfg_cls: type
    render_kwargs_train: Dict[str, Any]
    render_kwargs_test: Dict[str, Any]

    def make_render_cfg(self, test: bool = False, **overrides):
        kwargs = dict(self.render_kwargs_test if test
                      else self.render_kwargs_train)
        kwargs.update(overrides)
        return self.render_cfg_cls(**kwargs)


def get_model(args) -> FrameworkBundle:
    framework = args["model"]["framework"].lower()
    if framework == "volsdf":
        mcfg = volsdf_fw.model_cfg_from_config(args)
        train_kw, test_kw = volsdf_fw.render_kwargs_from_config(args)
        return FrameworkBundle(
            name="volsdf", mcfg=mcfg,
            init_params=lambda key: volsdf_fw.init_volsdf(key, mcfg),
            volume_render=volsdf_fw.volume_render,
            render_cfg_cls=volsdf_fw.VolSDFRenderCfg,
            render_kwargs_train=train_kw, render_kwargs_test=test_kw)
    if framework == "neus":
        mcfg = neus_fw.model_cfg_from_config(args)
        model = args["model"]
        train_kw = dict(
            upsample_algo=model.get("upsample_algo", "official_solution"),
            N_nograd_samples=int(model.get("N_nograd_samples", 2048)),
            N_upsample_iters=int(model.get("N_upsample_iters", 4)),
            N_outside=int(model.get("N_outside", 0)),
            obj_bounding_radius=float(
                args["data"].get("obj_bounding_radius", 1.0)),
            perturb=bool(model.get("perturb", True)),
            white_bkgd=bool(model.get("white_bkgd", False)),
            sampler_dtype=str(model.get("sampler_dtype", "float32")),
            render_dtype=str(model.get("render_dtype", "float32")),
            rays_chunk=(int(model["rays_chunk"])
                        if model.get("rays_chunk") else None),
        )
        test_kw = dict(train_kw)
        test_kw["perturb"] = False
        return FrameworkBundle(
            name="neus", mcfg=mcfg,
            init_params=lambda key: neus_fw.init_neus(key, mcfg),
            volume_render=neus_fw.volume_render,
            render_cfg_cls=neus_fw.NeuSRenderCfg,
            render_kwargs_train=train_kw, render_kwargs_test=test_kw)
    if framework == "unisurf":
        mcfg = unisurf_fw.model_cfg_from_config(args)
        model = args["model"]
        train_kw = dict(
            logit_tau=float(unisurf_fw.get_surface_from_opacity(
                float(model["tau"]))),
            radius_of_interest=float(model["obj_bounding_radius"]),
            perturb=bool(model.get("perturb", True)),
            white_bkgd=bool(model.get("white_bkgd", False)),
        )
        test_kw = dict(train_kw)
        test_kw["perturb"] = False
        return FrameworkBundle(
            name="unisurf", mcfg=mcfg,
            init_params=lambda key: unisurf_fw.init_unisurf(key, mcfg),
            volume_render=unisurf_fw.volume_render,
            render_cfg_cls=unisurf_fw.UNISURFRenderCfg,
            render_kwargs_train=train_kw, render_kwargs_test=test_kw)
    raise NotImplementedError(f"framework {framework}")
