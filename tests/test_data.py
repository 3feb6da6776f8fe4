"""Dataset layer tests on the real fangzhou scene (symlinked read-only)."""
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "..", "data",
                    "fangzhou_nature")
pytestmark = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="fangzhou dataset not available")


def test_dtu_dataset_loads():
    from nerfart_tpu.data.dtu import SceneDataset

    ds = SceneDataset(False, DATA, downscale=16, scale_radius=3.0)
    # the scene ships 100 pngs (plus a stray txt in images/)
    assert len(ds) == 100
    assert (ds.H, ds.W) == (60, 34) or ds.H * ds.W > 0
    idx, sample, gt = ds[0]
    assert sample["intrinsics"].shape == (4, 4)
    assert sample["c2w"].shape == (4, 4)
    assert gt["rgb"].shape == (ds.H * ds.W, 3)
    assert gt["rgb"].min() >= 0.0 and gt["rgb"].max() <= 1.0
    # camera rescale: all centers within scale_radius (DTU.py:67-70)
    centers = np.stack([c[:3, 3] for c in ds.c2w_all])
    assert np.linalg.norm(centers, axis=-1).max() <= 3.0 + 1e-5
    # masks loaded from matte/
    assert len(ds.object_masks) == 100
    assert ds.object_masks[0].dtype == bool


def test_get_data_dispatch():
    from nerfart_tpu.data import get_data

    args = {"data": {"type": "DTU", "data_dir": DATA, "downscale": 16,
                     "scale_radius": 3.0}}
    train, val = get_data(args, return_val=True, val_downscale=16)
    assert len(train) == len(val) == 100


def test_colmap_reader():
    sparse = os.path.join(DATA, "sparse", "0")
    if not os.path.isdir(sparse):
        pytest.skip("no COLMAP sparse model in dataset")
    from nerfart_tpu.data.colmap import (read_cameras_binary,
                                         read_images_binary)
    cams = read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    imgs = read_images_binary(os.path.join(sparse, "images.bin"))
    assert len(cams) >= 1
    assert len(imgs) >= 90
    im = imgs[1]
    assert im.qvec.shape == (4,)
    assert np.isfinite(im.tvec).all()


def test_camera_npz_against_reference_loader():
    """Our load_K_Rt_from_P must produce normalized intrinsics and valid
    rotations from the shipped cameras.npz."""
    from nerfart_tpu.data.dtu import load_K_Rt_from_P

    cam = np.load(os.path.join(DATA, "cameras.npz"))
    P = (cam["world_mat_0"] @ cam["scale_mat_0"])[:3, :4]
    K, pose = load_K_Rt_from_P(P)
    assert abs(K[2, 2] - 1.0) < 1e-6
    R = pose[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
