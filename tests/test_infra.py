"""Infrastructure tests: config system, checkpoint IO, mesh extraction,
camera paths, logger, parallel helpers."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfart_tpu.utils import checkpoints as ckpt
from nerfart_tpu.utils import config as cfg_mod
from nerfart_tpu.utils import mesh_util
from nerfart_tpu.utils import camera_paths


def test_config_yaml_roundtrip(tmp_path):
    """The reference's YAML configs load unchanged."""
    yaml_text = """
expname: test_exp
device_ids: -1
data:
  batch_size: 1
  data_dir: ./data/x
  downscale: 2
  near: 0.0
  far: 6.0
  N_rays: 2048
model:
  framework: VolSDF
  obj_bounding_radius: 3.0
training:
  lr: 5.0e-4
  log_root_dir: logs
  num_iters: 100
  scheduler:
    type: exponential_step
    min_factor: 0.1
  is_finetune: False
"""
    p = tmp_path / "c.yaml"
    p.write_text(yaml_text)
    c = cfg_mod.load_yaml(str(p))
    assert c.model.framework == "VolSDF"
    assert c["training"]["lr"] == 5.0e-4
    with pytest.raises(KeyError):
        _ = c.model.nonexistent
    # CLI override with section:key syntax + type coercion
    c = cfg_mod.update_config(c, ["--training:num_iters", "7",
                                  "--data:downscale", "4"])
    assert c.training.num_iters == 7 and isinstance(c.training.num_iters, int)
    assert c.data.downscale == 4
    # NEW keys may be introduced from the CLI (extension over the
    # reference, which KeyErrors at io_util.py:245); literal-eval coercion
    c = cfg_mod.update_config(c, ["--model:rays_chunk", "512",
                                  "--model:sampler_dtype", "bfloat16"])
    assert c.model.rays_chunk == 512
    assert c.model.sampler_dtype == "bfloat16"
    # save/load roundtrip
    c.training["exp_dir"] = "/tmp/x"
    cfg_mod.save_config(c, str(tmp_path / "saved.yaml"))
    c2 = cfg_mod.load_yaml(str(tmp_path / "saved.yaml"))
    assert c2.training.num_iters == 7


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": jnp.arange(6.0).reshape(2, 3),
              "layers": [{"w": jnp.ones((3, 2)), "b": jnp.zeros(3)},
                         {"g": jnp.ones((4, 1)), "v": jnp.ones((4, 3)),
                          "b": jnp.zeros(4)}],
              "scalar": jnp.asarray([0.5])}
    io = ckpt.CheckpointIO(str(tmp_path))
    io.register_modules(model=lambda: params, optimizer=lambda: {"count": 3})
    io.save("latest.npz", global_step=17, epoch_idx=2)
    blob = io.load_file("latest.npz")
    assert int(blob["global_step"]) == 17
    m = blob["model"]
    np.testing.assert_allclose(m["a"], np.arange(6.0).reshape(2, 3))
    assert isinstance(m["layers"], list) and len(m["layers"]) == 2
    np.testing.assert_allclose(m["layers"][1]["v"], np.ones((4, 3)))
    # ignore_keys filter (used by finetune loading, train.py:117-119)
    blob = io.load_file("latest.npz", ignore_keys=["optimizer"])
    assert "optimizer" not in blob and "model" in blob


def test_sorted_ckpts(tmp_path):
    for name in ["00000100.npz", "latest.npz", "00000050.npz",
                 "final_00000200.npz"]:
        (tmp_path / name).write_bytes(b"x")
    ordering = [os.path.basename(p)
                for p in ckpt.sorted_ckpts(str(tmp_path))]
    assert ordering == ["00000050.npz", "00000100.npz", "latest.npz",
                        "final_00000200.npz"]


def test_marching_tetrahedra_sphere(tmp_path):
    """Extracted iso-surface of an analytic sphere has verts at |x| ~ r."""
    N = 32
    xs = np.linspace(-1.5, 1.5, N, dtype=np.float32)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    grid = np.linalg.norm(g, axis=-1) - 1.0
    spacing = xs[1] - xs[0]
    verts, faces = mesh_util.marching_tetrahedra(
        grid, 0.0, spacing=(spacing,) * 3, origin=(-1.5, -1.5, -1.5))
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=-1)
    assert abs(r.mean() - 1.0) < 0.02
    assert np.abs(r - 1.0).max() < 0.15
    assert faces.max() < len(verts)
    # PLY write + reread
    path = str(tmp_path / "s.ply")
    mesh_util.write_ply(path, verts, faces)
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.vis_surface_and_cam import read_ply
    v2, f2 = read_ply(path)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)


def test_extract_mesh_from_sdf(tmp_path):
    def sdf_query(pts):
        return jnp.linalg.norm(pts, axis=-1) - 0.7

    path = str(tmp_path / "m.ply")
    verts, faces = mesh_util.extract_mesh(sdf_query, filepath=path,
                                          volume_size=2.0, N=24)
    r = np.linalg.norm(verts, axis=-1)
    assert abs(r.mean() - 0.7) < 0.03


def _fake_poses(n=10, radius=3.0):
    poses = []
    for th in np.linspace(0, 2 * np.pi, n, endpoint=False):
        c = np.array([radius * np.cos(th), 0.1, radius * np.sin(th)])
        poses.append(camera_paths.look_at(c, np.zeros(3)))
    return np.stack(poses)


def test_camera_paths_all():
    c2ws = _fake_poses()
    for path, kw in [("spiral", {}),
                     ("interpolation", {}),
                     ("small_circle", {"camera_inds": "0,2,4"}),
                     ("great_circle", {"camera_inds": "0,3"}),
                     ("spherical_spiral", {"camera_inds": "0,2,4"})]:
        out = camera_paths.generate_camera_path(path, c2ws, 12, **kw)
        out = np.asarray(out)
        assert out.shape[-2:] == (4, 4), path
        assert np.isfinite(out).all(), path
        # rotations are orthonormal
        R = out[..., :3, :3]
        rtr = np.einsum("...ij,...ik->...jk", R, R)
        np.testing.assert_allclose(
            rtr, np.broadcast_to(np.eye(3), rtr.shape), atol=1e-5)
    with pytest.raises(RuntimeError):
        camera_paths.generate_camera_path("bogus", c2ws, 5)


def test_parallel_dryrun_tiny():
    """Multi-device DP train step on the virtual CPU mesh (the driver's
    dryrun_multichip path)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge
    ge.dryrun_multichip(4)


def test_logger(tmp_path):
    from nerfart_tpu.utils.logger import Logger
    lg = Logger(str(tmp_path), monitoring="jsonl")
    lg.add("losses", "total", 0.5, 1)
    lg.add("losses", "total", jnp.asarray(0.25), 2)
    lg.add_imgs(np.random.rand(2, 3, 8, 8).astype(np.float32), "val/rgb", 1)
    lg.save_stats("stats.p")
    lg2 = Logger(str(tmp_path), monitoring=None)
    lg2.load_stats("stats.p")
    assert lg2.stats["losses"]["total"][1] == (2, 0.25)
    assert os.path.exists(tmp_path / "imgs" / "val" / "rgb" / "00000001.png")
