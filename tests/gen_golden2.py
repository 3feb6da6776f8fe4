"""Second golden batch: NeRF++ background paths, alternate NeuS upsample
algorithms, quaternion camera representation, surface rendering.

Run manually: python tests/gen_golden2.py  (requires /root/reference+torch)
"""
import pathlib
import sys

from gen_golden import REFERENCE, OUT, install_stubs


def main():
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    sys.path.insert(0, str(REFERENCE))
    install_stubs()
    import collections
    import inspect
    if not hasattr(inspect, "ArgSpec"):
        inspect.ArgSpec = collections.namedtuple(
            "ArgSpec", ["args", "varargs", "keywords", "defaults"])
    import numpy as np
    import torch

    torch.manual_seed(0)
    OUT.mkdir(exist_ok=True)

    from utils import rend_util
    from models.frameworks import volsdf as ref_volsdf
    from models.frameworks import neus as ref_neus
    from models import ray_casting as ref_rc

    def save(name, **arrays):
        np.savez(OUT / f"{name}.npz", **{
            k: (v.detach().numpy() if isinstance(v, torch.Tensor)
                else np.asarray(v)) for k, v in arrays.items()})
        print("wrote", name)

    # NOTE: no golden for the quaternion c2w path — the reference's
    # quat_to_rot is broken for any actual input shape
    # (rend_util.py:77 `prefix, _ = q.shape[:-1]` cannot unpack); the
    # rebuild's quat path is covered by a self-consistency test instead.

    # ------------- VolSDF with NeRF++ background
    # (the reference's nerf++ branch crashes as shipped: volsdf.py:531 calls
    # batchify_query without the required return_nablas kwarg; default it
    # here to capture the intended behavior)
    from utils import train_util as ref_tu
    _orig_bq = ref_tu.batchify_query

    def _bq(fn, *args, return_nablas=False, **kw):
        out = _orig_bq(fn, *args, return_nablas=return_nablas, **kw)
        # strip the padded None nabla slot (train_util.py:71-75) that makes
        # volsdf.py:531's 2-way unpack crash; safe here since the only
        # 2-output fn in this generation is nerf_outside.forward
        if isinstance(out, tuple) and len(out) == 3 and out[2] is None:
            return out[:2]
        return out

    ref_tu.batchify_query = _bq

    torch.manual_seed(11)
    vmodel = ref_volsdf.VolSDF(
        beta_init=0.1, speed_factor=10.0, W_geo_feat=32,
        obj_bounding_radius=3.0, use_nerfplusplus=True,
        surface_cfg=dict(W=64, D=4, skips=(2,), embed_multires=6),
        radiance_cfg=dict(D=2, W=64, skips=(), embed_multires=-1,
                          embed_multires_view=-1, use_view_dirs=True))
    N_rays = 6
    o = torch.zeros([N_rays, 3])
    o[:, 2] = -2.5
    o[:, 0] = torch.linspace(-0.3, 0.3, N_rays)
    d = torch.nn.functional.normalize(
        torch.stack([torch.linspace(-0.2, 0.2, N_rays),
                     0.1 * torch.ones(N_rays),
                     torch.ones(N_rays)], dim=-1), dim=-1)
    rgb, depth, extras = ref_volsdf.volume_render(
        o, d, vmodel, near=0.0, far=6.0, obj_bounding_radius=3.0,
        batched=False, require_nablas=True, calc_normal=True,
        use_view_dirs=True, rayschunk=4000, netchunk=1 << 20,
        white_bkgd=False, use_nerfplusplus=True, detailed_output=True,
        perturb=False, N_samples=16, N_importance=8, N_outside=8,
        max_upsample_steps=1, max_bisection_steps=3, epsilon=0.1)
    sd = {k: v.detach().numpy() for k, v in vmodel.state_dict().items()}
    save("volsdf_nerfpp", rays_o=o, rays_d=d, rgb=rgb, depth=depth,
         sigma_out=extras["sigma_out"], mask_volume=extras["mask_volume"],
         **{f"param::{k}": v for k, v in sd.items()})

    # ------------- NeuS with outside NeRF (N_outside>0)
    # neus.py:346 expects the padded 3-tuple: restore the original helper
    ref_tu.batchify_query = _orig_bq

    torch.manual_seed(12)
    nmodel = ref_neus.NeuS(
        variance_init=0.05, speed_factor=10.0, W_geo_feat=32,
        obj_bounding_radius=1.0, use_outside_nerf=True,
        surface_cfg=dict(W=64, D=4, skips=(2,), embed_multires=6,
                         radius_init=0.5),
        radiance_cfg=dict(D=2, W=64, skips=(), embed_multires=-1,
                          embed_multires_view=4, use_view_dirs=True))
    o8 = o * 0.3
    rgb, depth, extras = ref_neus.volume_render(
        o8, d, nmodel, obj_bounding_radius=1.0, batched=False,
        calc_normal=False, use_view_dirs=True, rayschunk=65536,
        netchunk=1 << 20, white_bkgd=False, detailed_output=True,
        perturb=False, N_samples=16, N_importance=8, N_outside=8,
        upsample_algo="official_solution", N_upsample_iters=2)
    sd = {k: v.detach().numpy() for k, v in nmodel.state_dict().items()}
    save("neus_nerfpp", rays_o=o8, rays_d=d, rgb=rgb, depth=depth,
         mask_volume=extras["mask_volume"],
         **{f"param::{k}": v for k, v in sd.items()})

    # ------------- NeuS direct_use / direct_more upsampling
    torch.manual_seed(8)
    nmodel2 = ref_neus.NeuS(
        variance_init=0.05, speed_factor=10.0, W_geo_feat=32,
        obj_bounding_radius=1.0, use_outside_nerf=False,
        surface_cfg=dict(W=64, D=4, skips=(2,), embed_multires=6,
                         radius_init=0.5),
        radiance_cfg=dict(D=2, W=64, skips=(), embed_multires=-1,
                          embed_multires_view=4, use_view_dirs=True))
    for algo in ["direct_use", "direct_more"]:
        rgb, depth, extras = ref_neus.volume_render(
            o8, d, nmodel2, obj_bounding_radius=1.0, batched=False,
            calc_normal=False, use_view_dirs=True, rayschunk=65536,
            netchunk=1 << 20, white_bkgd=False, detailed_output=True,
            perturb=False, N_samples=16, N_importance=8, N_outside=0,
            upsample_algo=algo, N_nograd_samples=128)
        sd = {k: v.detach().numpy() for k, v in nmodel2.state_dict().items()}
        save(f"neus_{algo}", rays_o=o8, rays_d=d, rgb=rgb, depth=depth,
             mask_volume=extras["mask_volume"],
             **{f"param::{k}": v for k, v in sd.items()})

    # ------------- surface rendering (sphere tracing + root finding) on the
    # tiny volsdf model's implicit surface
    torch.manual_seed(7)
    vmodel2 = ref_volsdf.VolSDF(
        beta_init=0.1, speed_factor=10.0, W_geo_feat=32,
        obj_bounding_radius=3.0, use_nerfplusplus=False,
        surface_cfg=dict(W=64, D=4, skips=(2,), embed_multires=6),
        radiance_cfg=dict(D=2, W=64, skips=(), embed_multires=-1,
                          embed_multires_view=-1, use_view_dirs=True))
    o2 = torch.zeros([1, 8, 3])
    o2[..., 2] = -2.5
    o2[0, :, 0] = torch.linspace(-0.4, 0.4, 8)
    d2 = torch.nn.functional.normalize(
        torch.stack([torch.linspace(-0.15, 0.15, 8),
                     torch.zeros(8), torch.ones(8)], dim=-1), dim=-1)[None]
    for algo in ["sphere_tracing", "root_finding"]:
        color, depth, extras = ref_rc.surface_render(
            o2, d2, vmodel2, calc_normal=True, rayschunk=8192,
            batched=True, use_view_dirs=True, ray_casting_algo=algo,
            near=0.0, far=6.0)
        sd = {k: v.detach().numpy() for k, v in vmodel2.state_dict().items()}
        save(f"surface_{algo}", rays_o=o2, rays_d=d2, color=color,
             depth=depth, mask=extras["mask_surface"],
             normals=extras["normals_surface"],
             **{f"param::{k}": v for k, v in sd.items()})


if __name__ == "__main__":
    main()
