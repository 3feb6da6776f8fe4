"""Third golden batch: UNISURF volume render.

Run manually: python tests/gen_golden3.py  (requires /root/reference+torch)
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

    OUT.mkdir(exist_ok=True)
    from models.frameworks import unisurf as ref_uni

    # unisurf calls batchify_query without the (later-added, required)
    # return_nablas kwarg and UNISURF.forward doesn't accept it either —
    # the framework is dead code as shipped; shim both sides to capture
    # the intended behavior
    from utils import train_util as ref_tu
    _orig_bq = ref_tu.batchify_query

    def _bq(fn, *args, return_nablas=False, **kw):
        def fn2(*a, return_nablas=None, **k):
            return fn(*a)
        return _orig_bq(fn2, *args, return_nablas=False, **kw)

    ref_tu.batchify_query = _bq

    def save(name, **arrays):
        np.savez(OUT / f"{name}.npz", **{
            k: (v.detach().numpy() if isinstance(v, torch.Tensor)
                else np.asarray(v)) for k, v in arrays.items()})
        print("wrote", name)

    torch.manual_seed(21)
    model = ref_uni.UNISURF(
        W_geo_feat=32,
        surface_cfg=dict(W=64, D=4, skips=(2,), embed_multires=6),
        radiance_cfg=dict(D=2, W=64, skips=(), embed_multires=-1,
                          embed_multires_view=-1, use_view_dirs=True))
    N = 8
    o = torch.zeros([N, 3])
    o[:, 2] = -2.5
    o[:, 0] = torch.linspace(-0.4, 0.4, N)
    d = torch.nn.functional.normalize(
        torch.stack([torch.linspace(-0.15, 0.15, N), torch.zeros(N),
                     torch.ones(N)], dim=-1), dim=-1)
    logit_tau = float(ref_uni.UNISURF.get_surface_from_opacity(0.5))
    # batched=True: the reference's unbatched path crashes in
    # root_finding_surface_points (ray_casting.py:150 indexes 1-dim far
    # with a 2-dim mask)
    o, d = o[None], d[None]
    rgb, depth, extras = ref_uni.volume_render(
        o, d, model, batched=True, calc_normal=True, logit_tau=logit_tau,
        use_view_dirs=True, rayschunk=65536, netchunk=1 << 20,
        white_bkgd=False, detailed_output=True, radius_of_interest=3.0,
        perturb=False, interval=0.5, too_close_threshold=0.1,
        N_query=16, N_freespace=8)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    save("unisurf_render", rays_o=o, rays_d=d, rgb=rgb, depth=depth,
         mask_volume=extras["mask_volume"],
         depth_surface=extras["depth_surface"],
         mask_surface=extras["mask_surface"],
         alpha=extras["alpha"], logit_tau=logit_tau,
         normals=extras["normals_volume"],
         **{f"param::{k}": v for k, v in sd.items()})


if __name__ == "__main__":
    main()
