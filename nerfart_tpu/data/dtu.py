"""DTU / IDR-format scene dataset (cameras.npz) (reference dataio/DTU.py).

Loads `world_mat_%d @ scale_mat_%d` projection matrices -> (K, c2w) via
cv2.decomposeProjectionMatrix (reference utils/rend_util.py:8-25), all RGB
images flattened to [H*W, 3] in host RAM, optional `matte/` masks, and the
camera-rescale-to-sphere normalization (DTU.py:67-70).

Pure numpy — feeding a jit-compiled train step needs no framework
DataLoader; `SceneDataset[i]` returns the same (idx, model_input,
ground_truth) triple as the reference.
"""
import os
from typing import Optional

import numpy as np

from nerfart_tpu.data.image_io import glob_imgs, load_mask, load_rgb


def load_K_Rt_from_P(P: np.ndarray):
    """Decompose a 3x4 projection into (intrinsics 4x4, c2w 4x4)
    (reference rend_util.py:8-25)."""
    import cv2
    out = cv2.decomposeProjectionMatrix(P)
    K, R, t = out[0], out[1], out[2]
    K = K / K[2, 2]
    intrinsics = np.eye(4)
    intrinsics[:3, :3] = K
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.transpose()
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return intrinsics, pose


class SceneDataset:
    def __init__(self, train_cameras: bool, data_dir: str, downscale: float = 1.0,
                 cam_file: Optional[str] = None, scale_radius: float = -1):
        assert os.path.exists(data_dir), f"Data directory {data_dir} is empty"
        self.instance_dir = data_dir
        self.train_cameras = train_cameras
        self.downscale = downscale

        # accept both the NeRF-Art layout (images/ + matte/ + cameras.npz)
        # and the IDR/NeuS layout (image/ + mask/ + cameras_sphere.npz),
        # which the shipped shuquan_nature/preprocessed scene uses
        image_paths = sorted(glob_imgs(os.path.join(data_dir, "images")))
        if not image_paths:
            image_paths = sorted(glob_imgs(os.path.join(data_dir, "image")))
        assert image_paths, f"no images under {data_dir}/(images|image)"
        mask_paths = sorted(glob_imgs(os.path.join(data_dir, "matte")))
        if not mask_paths:
            mask_paths = sorted(glob_imgs(os.path.join(data_dir, "mask")))
        self.n_images = len(image_paths)

        tmp = load_rgb(image_paths[0], downscale)
        _, self.H, self.W = tmp.shape

        if cam_file is None:
            cam_file = "cameras.npz"
            if not os.path.exists(os.path.join(data_dir, cam_file)):
                cam_file = "cameras_sphere.npz"
        self.cam_file = os.path.join(data_dir, cam_file)
        camera_dict = np.load(self.cam_file)
        scale_mats = [camera_dict[f"scale_mat_{i}"].astype(np.float32)
                      for i in range(self.n_images)]
        world_mats = [camera_dict[f"world_mat_{i}"].astype(np.float32)
                      for i in range(self.n_images)]

        self.intrinsics_all = []
        self.c2w_all = []
        cam_center_norms = []
        for scale_mat, world_mat in zip(scale_mats, world_mats):
            P = (world_mat @ scale_mat)[:3, :4]
            intrinsics, pose = load_K_Rt_from_P(P)
            cam_center_norms.append(np.linalg.norm(pose[:3, 3]))
            # downscale intrinsics; skew is a ratio, not scaled (DTU.py:58-63)
            intrinsics[0, 2] /= downscale
            intrinsics[1, 2] /= downscale
            intrinsics[0, 0] /= downscale
            intrinsics[1, 1] /= downscale
            self.intrinsics_all.append(intrinsics.astype(np.float32))
            self.c2w_all.append(pose.astype(np.float32))

        if scale_radius > 0:
            max_cam_norm = max(cam_center_norms)
            for i in range(len(self.c2w_all)):
                self.c2w_all[i][:3, 3] *= scale_radius / max_cam_norm / 1.1

        self.rgb_images = []
        for path in image_paths:
            rgb = load_rgb(path, downscale)
            self.rgb_images.append(
                rgb.reshape(3, -1).transpose(1, 0).astype(np.float32))

        self.object_masks = []
        for path in mask_paths:
            self.object_masks.append(load_mask(path, downscale).reshape(-1))

    def __len__(self):
        return self.n_images

    def __getitem__(self, idx):
        sample = {"intrinsics": self.intrinsics_all[idx]}
        if idx < len(self.object_masks):
            sample["object_mask"] = self.object_masks[idx]
        if not self.train_cameras:
            sample["c2w"] = self.c2w_all[idx]
        ground_truth = {"rgb": self.rgb_images[idx]}
        return idx, sample, ground_truth

    def get_scale_mat(self):
        return np.load(self.cam_file)["scale_mat_0"]

    def get_pose_init(self):
        """Noisy linear-method pose initializations as [N, 7] quat+trans
        (reference DTU.py:146-163; defined for pose-refinement experiments,
        never called by the reference's own training loop)."""
        cam_file = os.path.join(self.instance_dir, "cameras_linear_init.npz")
        camera_dict = np.load(cam_file)
        poses = []
        for i in range(self.n_images):
            P = (camera_dict[f"world_mat_{i}"].astype(np.float32)
                 @ camera_dict[f"scale_mat_{i}"].astype(np.float32))
            _, pose = load_K_Rt_from_P(P[:3, :4])
            poses.append(pose)
        poses = np.stack(poses)
        from nerfart_tpu.ops.rays import rot_to_quat
        quat = np.asarray(rot_to_quat(poses[:, :3, :3]))
        return np.concatenate([quat, poses[:, :3, 3]], axis=1)

    def get_gt_pose(self, scaled: bool = True):
        camera_dict = np.load(self.cam_file)
        poses = []
        for i in range(self.n_images):
            P = camera_dict[f"world_mat_{i}"].astype(np.float32)
            if scaled:
                P = P @ camera_dict[f"scale_mat_{i}"].astype(np.float32)
            _, pose = load_K_Rt_from_P(P[:3, :4])
            poses.append(pose)
        return np.stack(poses)
