"""Generate golden parity data by running the REFERENCE implementation.

Run manually (requires /root/reference and torch):
    python tests/gen_golden.py

Records reference outputs into tests/golden/*.npz; the pytest suite then
checks the JAX rebuild against them without needing the reference at test
time. This implements the golden-test strategy from SURVEY.md §4.

The reference's optional deps (clip, torchvision, addict, skimage, plyfile)
are stubbed since only the numeric paths are exercised here.
"""
import pathlib
import sys
import types

REFERENCE = pathlib.Path("/root/reference")
OUT = pathlib.Path(__file__).parent / "golden"


def install_stubs():
    # addict.Dict -> attribute dict
    addict = types.ModuleType("addict")

    class Dict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    addict.Dict = Dict
    sys.modules.setdefault("addict", addict)

    # skimage (only image io helpers import it)
    skimage = types.ModuleType("skimage")
    skimage.img_as_float32 = lambda x: x
    transform = types.ModuleType("skimage.transform")
    transform.rescale = None
    skimage.transform = transform
    sys.modules.setdefault("skimage", skimage)
    sys.modules.setdefault("skimage.transform", transform)

    # torchvision stub (utils/logger.py imports it for image grids)
    tv = types.ModuleType("torchvision")
    tv.utils = types.ModuleType("torchvision.utils")
    tv.utils.make_grid = lambda *a, **k: None
    tv.utils.save_image = lambda *a, **k: None
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.utils", tv.utils)

    # criteria.* stubs (pull in clip/torchvision otherwise)
    crit = types.ModuleType("criteria")
    sys.modules.setdefault("criteria", crit)
    for name, cls_names in {
        "clip_loss": ["CLIPLoss"],
        "patchnce_loss": ["PatchNCELoss"],
        "contrastive_loss": ["ContrastiveLoss"],
        "perp_loss": ["VGGPerceptualLoss"],
    }.items():
        mod = types.ModuleType(f"criteria.{name}")
        for cn in cls_names:
            setattr(mod, cn, type(cn, (), {}))
        sys.modules.setdefault(f"criteria.{name}", mod)


def main():
    sys.path.insert(0, str(REFERENCE))
    install_stubs()
    # volsdf.py does `from inspect import ArgSpec` (removed in py3.11)
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
    from models import base as ref_base
    from models.frameworks import volsdf as ref_volsdf
    from models.frameworks import neus as ref_neus

    def save(name, **arrays):
        np.savez(OUT / f"{name}.npz", **{
            k: (v.detach().numpy() if isinstance(v, torch.Tensor) else np.asarray(v))
            for k, v in arrays.items()})
        print("wrote", name)

    g = torch.Generator().manual_seed(1234)

    # ---------------- ray math
    c2w = torch.eye(4)
    c2w[:3, 3] = torch.tensor([0.3, -0.2, -4.0])
    # rotate a bit
    th = 0.3
    c2w[:3, :3] = torch.tensor([
        [np.cos(th), 0, np.sin(th)],
        [0, 1, 0],
        [-np.sin(th), 0, np.cos(th)]], dtype=torch.float32)
    intr = torch.eye(4)
    intr[0, 0], intr[1, 1] = 350.0, 360.0
    intr[0, 2], intr[1, 2] = 20.5, 14.5
    intr[0, 1] = 0.37  # nonzero skew to exercise the skew-aware lift
    H, W = 30, 42
    rays_o, rays_d, sel = rend_util.get_rays(c2w[None], intr[None], H, W, N_rays=-1)
    save("get_rays", c2w=c2w, intr=intr, H=H, W=W,
         rays_o=rays_o, rays_d=rays_d, select_inds=sel)

    rd = torch.nn.functional.normalize(rays_d, dim=-1)
    near, far = rend_util.near_far_from_sphere(rays_o, rd, r=3.0)
    n2, f2, mask = rend_util.get_sphere_intersection(rays_o, rd, r=3.0)
    rs = torch.linspace(3.0, 5.0, 8).expand(*rays_o.shape[:-1], 8)
    dv = rend_util.get_dvals_from_radius(rays_o, rd, rs)
    save("sphere_math", rays_o=rays_o, rays_d=rd, near=near, far=far,
         inear=n2, ifar=f2, imask=mask, rs=rs, dvals_radius=dv)

    # ---------------- sampling (det only; stochastic paths differ by RNG)
    bins = torch.sort(torch.rand([7, 17], generator=g) * 5.0, dim=-1).values
    weights = torch.rand([7, 16], generator=g)
    sp = rend_util.sample_pdf(bins, weights, 33, det=True)
    cdf_vals = torch.cumsum(torch.rand([7, 16], generator=g) * 0.1, dim=-1)
    sc = rend_util.sample_cdf(bins, cdf_vals, 21, det=True)
    save("sampling", bins=bins, weights=weights, sp=sp, cdf=cdf_vals, sc=sc)

    # ---------------- volsdf math
    sdf = torch.randn([5, 33], generator=g)
    d_vals = torch.sort(torch.rand([5, 33], generator=g) * 6.0, dim=-1).values
    sig = ref_volsdf.sdf_to_sigma(sdf, 10.0, 0.1)
    eb = ref_volsdf.error_bound(d_vals, sdf, 10.0, 0.1)
    save("volsdf_math", sdf=sdf, d_vals=d_vals, sigma=sig, bounds=eb)

    # fine_sample against an analytic sphere SDF (r=1.5)
    def sphere_sdf(pts):
        return pts.norm(dim=-1) - 1.5, None

    N_rays = 9
    o = torch.zeros([N_rays, 3])
    o[:, 2] = -4.0
    o[:, 0] = torch.linspace(-0.5, 0.5, N_rays)
    d = torch.nn.functional.normalize(
        torch.stack([torch.linspace(-0.3, 0.3, N_rays),
                     torch.linspace(-0.1, 0.1, N_rays),
                     torch.ones(N_rays)], dim=-1), dim=-1)
    init_d = torch.linspace(0, 1, 64)[None, :] * 8.0 * torch.ones([N_rays, 1])
    fine_d, beta, usage = ref_volsdf.fine_sample(
        sphere_sdf, init_d, o, d,
        alpha_net=10.0, beta_net=0.1, far=8.0,
        eps=0.1, max_iter=3, max_bisection=5,
        final_N_importance=16, N_up=64, perturb=False)
    save("fine_sample", rays_o=o, rays_d=d, init_d=init_d,
         fine_d=fine_d, beta=beta, usage=usage)

    # ---------------- neus math
    s = 64.0
    cdf, alpha = ref_neus.sdf_to_alpha(sdf, s)
    _, _, w = ref_neus.sdf_to_w(sdf, s)
    save("neus_math", sdf=sdf, s=s, cdf=cdf, alpha=alpha, w=w)

    # neus upsample (official_solution) on the sphere, via volume_render's
    # internals is hard to isolate; replicate by calling through a tiny model
    # below instead.

    # ---------------- networks: record weights + input/output pairs
    torch.manual_seed(42)
    surf = ref_base.ImplicitSurface(W=64, D=4, skips=[2], W_geo_feat=32,
                                    embed_multires=6)
    x = torch.randn([11, 3], generator=g)
    sdf_out, h_out = surf.forward(x, return_h=True)
    sdf_n, nablas, h_n = surf.forward_with_nablas(x)
    sd = {k: v.detach().numpy() for k, v in surf.state_dict().items()}
    save("implicit_surface", x=x, sdf=sdf_out, h=h_out, nablas=nablas,
         **{f"param::{k}": v for k, v in sd.items()})

    torch.manual_seed(43)
    rad = ref_base.RadianceNet(D=2, W=64, skips=[], W_geo_feat=32,
                               embed_multires=-1, embed_multires_view=4)
    vd = torch.nn.functional.normalize(torch.randn([11, 3], generator=g), dim=-1)
    nrm = torch.nn.functional.normalize(torch.randn([11, 3], generator=g), dim=-1)
    feat = torch.randn([11, 32], generator=g)
    rgb = rad.forward(x, vd, nrm, feat)
    sd = {k: v.detach().numpy() for k, v in rad.state_dict().items()}
    save("radiance_net", x=x, vd=vd, nrm=nrm, feat=feat, rgb=rgb,
         **{f"param::{k}": v for k, v in sd.items()})

    torch.manual_seed(44)
    nerf = ref_base.NeRF(D=4, W=64, input_ch=4, input_ch_view=3,
                         multires=10, multires_view=4, use_view_dirs=True)
    x4 = torch.randn([11, 4], generator=g)
    sigma_o, rgb_o = nerf.forward(x4, vd)
    sd = {k: v.detach().numpy() for k, v in nerf.state_dict().items()}
    save("nerf_bg", x=x4, vd=vd, sigma=sigma_o, rgb=rgb_o,
         **{f"param::{k}": v for k, v in sd.items()})

    # ---------------- full VolSDF volume_render on a tiny model
    torch.manual_seed(7)
    vmodel = ref_volsdf.VolSDF(
        beta_init=0.1, speed_factor=10.0, W_geo_feat=32, obj_bounding_radius=3.0,
        use_nerfplusplus=False,
        surface_cfg=dict(W=64, D=4, skips=[2], embed_multires=6),
        radiance_cfg=dict(D=2, W=64, skips=[], embed_multires=-1,
                          embed_multires_view=-1, use_view_dirs=True))
    o16 = o[:8]
    d16 = d[:8]
    rgb, depth, extras = ref_volsdf.volume_render(
        o16, d16, vmodel, near=0.0, far=6.0, obj_bounding_radius=3.0,
        batched=False, require_nablas=True, calc_normal=True,
        use_view_dirs=True, rayschunk=4000, netchunk=1 << 20,
        white_bkgd=False, use_nerfplusplus=False, detailed_output=True,
        perturb=False, N_samples=32, N_importance=16,
        max_upsample_steps=2, max_bisection_steps=5, epsilon=0.1)
    sd = {k: v.detach().numpy() for k, v in vmodel.state_dict().items()}
    save("volsdf_render", rays_o=o16, rays_d=d16,
         rgb=rgb, depth=depth,
         sdf=extras["implicit_surface"], sigma=extras["sigma"],
         d_vals=extras["d_vals"], weights=extras["visibility_weights"],
         beta_map=extras["beta_map"], iter_usage=extras["iter_usage"],
         mask_volume=extras["mask_volume"],
         normals=extras["normals_volume"], nablas=extras["implicit_nablas"],
         **{f"param::{k}": v for k, v in sd.items()})

    # ---------------- full NeuS volume_render on a tiny model
    torch.manual_seed(8)
    nmodel = ref_neus.NeuS(
        variance_init=0.05, speed_factor=10.0, W_geo_feat=32,
        obj_bounding_radius=1.0, use_outside_nerf=False,
        surface_cfg=dict(W=64, D=4, skips=[2], embed_multires=6, radius_init=0.5),
        radiance_cfg=dict(D=2, W=64, skips=[], embed_multires=-1,
                          embed_multires_view=4, use_view_dirs=True))
    o8 = o[:8] * 0.25  # bring origins near the unit sphere setup
    rgb, depth, extras = ref_neus.volume_render(
        o8, d16, nmodel, obj_bounding_radius=1.0, batched=False,
        calc_normal=True, use_view_dirs=True, rayschunk=65536,
        netchunk=1 << 20, white_bkgd=False, detailed_output=True,
        perturb=False, N_samples=24, N_importance=16, N_outside=0,
        upsample_algo="official_solution", N_upsample_iters=4)
    sd = {k: v.detach().numpy() for k, v in nmodel.state_dict().items()}
    save("neus_render", rays_o=o8, rays_d=d16,
         rgb=rgb, depth=depth, sdf=extras["implicit_surface"],
         cdf=extras["cdf"], weights=extras["visibility_weights"],
         d_final=extras["d_final"], alpha=extras["alpha"],
         mask_volume=extras["mask_volume"], normals=extras["normals_volume"],
         **{f"param::{k}": v for k, v in sd.items()})

    # ---------------- LR schedules
    lam_c = ref_base.CosineAnnealWarmUpSchedulerLambda(1000, 100, 0.1)
    lam_e = ref_base.ExponentialSchedulerLambda(1000, 0.1)
    steps = np.arange(0, 1100, 7)
    save("schedules", steps=steps,
         cos=np.array([lam_c(int(s)) for s in steps]),
         exp=np.array([lam_e(int(s)) for s in steps]))


if __name__ == "__main__":
    main()
