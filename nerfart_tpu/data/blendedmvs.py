"""BlendedMVS scene dataset (MVSNet *_cam.txt format)
(reference dataio/BlendedMVS.py)."""
import os

import numpy as np

from nerfart_tpu.data.image_io import glob_imgs, load_rgb


def load_cam(filepath: str, interval_scale: float = 1,
             original_blendedmvs: bool = False) -> np.ndarray:
    """Read an MVSNet camera txt -> [2, 4, 4] (extrinsic, intrinsic)
    (reference BlendedMVS.py:112-151)."""
    cam = np.repeat(np.eye(4)[None, ...], repeats=2, axis=0)
    words = open(filepath).read().split()
    for i in range(4):
        for j in range(4):
            cam[0][i][j] = words[4 * i + j + 1]
    for i in range(3):
        for j in range(3):
            cam[1][i][j] = words[3 * i + j + 18]
    if original_blendedmvs:
        if len(words) == 29:
            cam[1][3][0] = words[27]
            cam[1][3][1] = float(words[28]) * interval_scale
            cam[1][3][2] = 128
            cam[1][3][3] = cam[1][3][0] + cam[1][3][1] * cam[1][3][2]
        elif len(words) == 30:
            cam[1][3][0] = words[27]
            cam[1][3][1] = float(words[28]) * interval_scale
            cam[1][3][2] = words[29]
            cam[1][3][3] = cam[1][3][0] + cam[1][3][1] * cam[1][3][2]
        elif len(words) == 31:
            cam[1][3][0] = words[27]
            cam[1][3][1] = float(words[28]) * interval_scale
            cam[1][3][2] = words[29]
            cam[1][3][3] = words[30]
        else:
            cam[1][3] = 0
    return cam


def write_cam(filepath: str, cam: np.ndarray):
    """Write an MVSNet camera txt (reference BlendedMVS.py:154-172)."""
    with open(filepath, "w") as f:
        f.write("extrinsic\n")
        for i in range(4):
            f.write(" ".join(str(cam[0][i][j]) for j in range(4)) + " \n")
        f.write("\nintrinsic\n")
        for i in range(3):
            f.write(" ".join(str(cam[1][i][j]) for j in range(3)) + " \n")
        f.write("\n" + " ".join(str(cam[1][3][j]) for j in range(4)) + "\n")


class SceneDataset:
    def __init__(self, train_cameras: bool, data_dir: str, downscale: float = 1.0,
                 scale_radius: float = -1):
        assert os.path.exists(data_dir), "Data directory is empty"
        self.instance_dir = data_dir
        self.train_cameras = train_cameras
        self.downscale = downscale

        image_dir = os.path.join(data_dir, "blended_images")
        cam_dir = os.path.join(data_dir, "cams_normalized")

        self.intrinsics_all = []
        self.c2w_all = []
        self.rgb_images = []
        self.basenames = []
        cam_center_norms = []
        for imgpath in sorted(glob_imgs(image_dir)):
            if "masked" in imgpath:
                continue
            basename = os.path.splitext(os.path.split(imgpath)[-1])[0]
            self.basenames.append(basename)
            cam = load_cam(os.path.join(cam_dir, f"{basename}_cam.txt"))
            extrinsics, intrinsics = cam[0], cam[1]
            c2w = np.linalg.inv(extrinsics)
            cam_center_norms.append(np.linalg.norm(c2w[:3, 3]))
            intrinsics = intrinsics.copy()
            intrinsics[0, 2] /= downscale
            intrinsics[1, 2] /= downscale
            intrinsics[0, 0] /= downscale
            intrinsics[1, 1] /= downscale
            self.intrinsics_all.append(intrinsics.astype(np.float32))
            self.c2w_all.append(c2w.astype(np.float32))

            rgb = load_rgb(imgpath, downscale)
            _, self.H, self.W = rgb.shape
            self.rgb_images.append(
                rgb.reshape(3, -1).transpose(1, 0).astype(np.float32))

        if scale_radius > 0:
            max_cam_norm = max(cam_center_norms)
            for i in range(len(self.c2w_all)):
                self.c2w_all[i][:3, 3] *= scale_radius / max_cam_norm / 1.1
        self.n_images = len(self.rgb_images)

    def __len__(self):
        return self.n_images

    def __getitem__(self, idx):
        sample = {"intrinsics": self.intrinsics_all[idx]}
        if not self.train_cameras:
            sample["c2w"] = self.c2w_all[idx]
        return idx, sample, {"rgb": self.rgb_images[idx]}

    def get_gt_pose(self):
        return np.stack(self.c2w_all)
