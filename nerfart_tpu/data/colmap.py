"""COLMAP sparse-model reading and camera conversion (numpy, offline).

Covers the reference's offline data-prep layer (reference
data/read_wrote_model.py — stock COLMAP reader; data/colmap2volsdf.py —
world_mat export; data/pose_utils.py — LLFF pose generation) as a single
compact module. The binary/text layouts are dictated by COLMAP's public
model format; everything else (vectorized parsing, the normalization
step, bounds computation) is an original implementation.
"""
import os
import struct
from dataclasses import dataclass

import numpy as np

# COLMAP model_id -> number of params (public COLMAP camera model table)
CAMERA_MODEL_NUM_PARAMS = {
    0: 3,   # SIMPLE_PINHOLE: f, cx, cy
    1: 4,   # PINHOLE: fx, fy, cx, cy
    2: 4,   # SIMPLE_RADIAL
    3: 5,   # RADIAL
    4: 8,   # OPENCV
    5: 8,   # OPENCV_FISHEYE
    6: 12,  # FULL_OPENCV
    7: 5,   # FOV
    8: 4,   # SIMPLE_RADIAL_FISHEYE
    9: 5,   # RADIAL_FISHEYE
    10: 12, # THIN_PRISM_FISHEYE
}
CAMERA_MODEL_IDS = {
    "SIMPLE_PINHOLE": 0, "PINHOLE": 1, "SIMPLE_RADIAL": 2, "RADIAL": 3,
    "OPENCV": 4, "OPENCV_FISHEYE": 5, "FULL_OPENCV": 6, "FOV": 7,
    "SIMPLE_RADIAL_FISHEYE": 8, "RADIAL_FISHEYE": 9, "THIN_PRISM_FISHEYE": 10,
}


@dataclass
class Camera:
    id: int
    model_id: int
    width: int
    height: int
    params: np.ndarray


@dataclass
class Image:
    id: int
    qvec: np.ndarray   # (4,) w,x,y,z
    tvec: np.ndarray   # (3,)
    camera_id: int
    name: str


@dataclass
class Point3D:
    id: int
    xyz: np.ndarray
    rgb: np.ndarray
    error: float
    image_ids: np.ndarray
    point2D_idxs: np.ndarray


def qvec2rotmat(q):
    """COLMAP (w,x,y,z) quaternion -> rotation matrix."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def rotmat2qvec(R):
    """Rotation matrix -> COLMAP (w,x,y,z) quaternion (Shepperd's method)."""
    m00, m01, m02 = R[0]
    m10, m11, m12 = R[1]
    m20, m21, m22 = R[2]
    K = np.array([
        [m00 - m11 - m22, 0, 0, 0],
        [m01 + m10, m11 - m00 - m22, 0, 0],
        [m02 + m20, m12 + m21, m22 - m00 - m11, 0],
        [m21 - m12, m02 - m20, m10 - m01, m00 + m11 + m22],
    ]) / 3.0
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    return q * np.sign(q[0]) if q[0] != 0 else q


def _read(fid, fmt):
    size = struct.calcsize("<" + fmt)
    return struct.unpack("<" + fmt, fid.read(size))


def read_cameras_binary(path):
    cameras = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "Q")
        for _ in range(n):
            cam_id, model_id, width, height = _read(f, "iiQQ")
            num_params = CAMERA_MODEL_NUM_PARAMS[model_id]
            params = np.array(_read(f, "d" * num_params))
            cameras[cam_id] = Camera(cam_id, model_id, int(width),
                                     int(height), params)
    return cameras


def read_images_binary(path):
    images = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "Q")
        for _ in range(n):
            vals = _read(f, "idddddddi")
            im_id, camera_id = vals[0], vals[8]
            qvec = np.array(vals[1:5])
            tvec = np.array(vals[5:8])
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (npts,) = _read(f, "Q")
            f.seek(24 * npts, os.SEEK_CUR)  # skip (x, y, point3D_id) triples
            images[im_id] = Image(im_id, qvec, tvec, camera_id,
                                  name.decode("utf-8"))
    return images


def read_points3d_binary(path):
    points = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "Q")
        for _ in range(n):
            vals = _read(f, "QdddBBBd")
            pid, error = vals[0], vals[7]
            xyz = np.array(vals[1:4])
            rgb = np.array(vals[4:7], dtype=np.uint8)
            (track_len,) = _read(f, "Q")
            track = np.frombuffer(f.read(8 * track_len),
                                  dtype=np.int32).reshape(-1, 2)
            points[pid] = Point3D(pid, xyz, rgb, float(error),
                                  track[:, 0].copy(), track[:, 1].copy())
    return points


def _data_lines(path):
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                yield line


def read_cameras_text(path):
    cameras = {}
    for line in _data_lines(path):
        parts = line.split()
        cam_id = int(parts[0])
        cameras[cam_id] = Camera(cam_id, CAMERA_MODEL_IDS[parts[1]],
                                 int(parts[2]), int(parts[3]),
                                 np.array(parts[4:], dtype=np.float64))
    return cameras


def read_images_text(path):
    # Each image entry is a header line followed by exactly one points2D
    # line, which may be EMPTY (zero keypoints) — so blank-line filtering
    # can't be used to pair them; consume two data lines per entry like
    # the official format spec prescribes.
    images = {}
    with open(path, "r") as f:
        expecting_points = False
        for line in f:
            stripped = line.strip()
            if stripped.startswith("#"):
                continue
            if expecting_points:
                expecting_points = False  # points2D line (possibly empty)
                continue
            if not stripped:
                continue
            parts = stripped.split()
            im_id = int(parts[0])
            images[im_id] = Image(
                im_id, np.array(parts[1:5], dtype=np.float64),
                np.array(parts[5:8], dtype=np.float64),
                int(parts[8]), parts[9])
            expecting_points = True
    return images


def read_points3d_text(path):
    points = {}
    for line in _data_lines(path):
        parts = line.split()
        track = np.array(parts[8:], dtype=np.int32).reshape(-1, 2)
        points[int(parts[0])] = Point3D(
            int(parts[0]), np.array(parts[1:4], dtype=np.float64),
            np.array(parts[4:7], dtype=np.uint8), float(parts[7]),
            track[:, 0].copy(), track[:, 1].copy())
    return points


def read_model(sparse_dir):
    """Read a COLMAP sparse model directory, auto-detecting bin/text."""
    ext = ".bin" if os.path.exists(
        os.path.join(sparse_dir, "cameras.bin")) else ".txt"
    readers = {
        ".bin": (read_cameras_binary, read_images_binary,
                 read_points3d_binary),
        ".txt": (read_cameras_text, read_images_text, read_points3d_text),
    }[ext]
    return tuple(r(os.path.join(sparse_dir, name + ext))
                 for r, name in zip(readers, ("cameras", "images",
                                              "points3D")))


def intrinsics_from_camera(cam):
    """3x3 K from a COLMAP camera (pinhole family; distortion ignored,
    as in the reference which indexes params[0..3] directly,
    reference data/colmap2volsdf.py:18-22)."""
    K = np.eye(3)
    if cam.model_id == 0:  # SIMPLE_PINHOLE: f, cx, cy
        K[0, 0] = K[1, 1] = cam.params[0]
        K[0, 2], K[1, 2] = cam.params[1], cam.params[2]
    else:  # PINHOLE-style leading params: fx, fy, cx, cy
        K[0, 0], K[1, 1] = cam.params[0], cam.params[1]
        K[0, 2], K[1, 2] = cam.params[2], cam.params[3]
    return K


def colmap_to_world_mats(root_dir):
    """COLMAP sparse/0 -> {'world_mat_%d': K @ [R|t] as 4x4} in image-id
    order (ids 1..N map to entries 0..N-1, matching the reference's
    data/colmap2volsdf.py:26-37 output convention consumed by the
    DTU/IDR-format datasets)."""
    sparse = os.path.join(root_dir, "sparse", "0")
    cameras = (read_cameras_binary(os.path.join(sparse, "cameras.bin"))
               if os.path.exists(os.path.join(sparse, "cameras.bin"))
               else read_cameras_text(os.path.join(sparse, "cameras.txt")))
    images = (read_images_binary(os.path.join(sparse, "images.bin"))
              if os.path.exists(os.path.join(sparse, "images.bin"))
              else read_images_text(os.path.join(sparse, "images.txt")))
    K = intrinsics_from_camera(cameras[min(cameras)])
    out = {}
    for i, im_id in enumerate(sorted(images)):
        im = images[im_id]
        M = np.concatenate([qvec2rotmat(im.qvec),
                            im.tvec.reshape(3, 1)], axis=1)
        P = np.eye(4)
        P[:3, :] = K @ M
        out["world_mat_%d" % i] = P
    return out


def camera_centers(world_mats):
    """Camera centers from K@[R|t] world mats (decompose via the null
    space: center c satisfies [R|t] @ [c;1] = 0)."""
    centers = []
    for i in range(len(world_mats)):
        P = world_mats["world_mat_%d" % i][:3, :]
        # c = -R^T t where K@[R|t] = P: recover [R|t] by QR-free route —
        # the right null vector of P (3x4, rank 3) is [c; 1] up to scale.
        _, _, vt = np.linalg.svd(P)
        c = vt[-1]
        centers.append(c[:3] / c[3])
    return np.stack(centers)


def normalize_cameras(world_mats, target_radius=1.0):
    """Add IDR-style 'scale_mat_%d' entries: a similarity transform that
    re-centers the camera rig at the origin and scales the maximum camera
    distance to `target_radius`. (The reference defers this step to the
    IDR preprocessing pipeline; cameras.npz consumers expect
    world_mat_%d x scale_mat_%d, see data/dtu.py.)"""
    centers = camera_centers(world_mats)
    center = centers.mean(axis=0)
    radius = np.linalg.norm(centers - center, axis=1).max()
    S = np.eye(4)
    S[:3, :3] *= radius / target_radius
    S[:3, 3] = center
    out = dict(world_mats)
    for i in range(len(world_mats)):
        out["scale_mat_%d" % i] = S.copy()
    return out


def _write_ply_points(path, pts):
    """Minimal ascii PLY point-cloud writer (no plyfile/trimesh deps)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(pts)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n")
        np.savetxt(f, pts, fmt="%.6f")


def gen_poses_bounds(scenedir):
    """COLMAP sparse/0 -> LLFF-style poses (+ depth bounds).

    Mirrors the reference's data/pose_utils.py gen_poses/load_colmap_data/
    save_poses semantics: c2w = inv([R|t; 0 1]), camera-axis COLUMNS
    permuted [r, -u, t] -> [-u, r, -t] (pose_utils.py:52 slices dim 1 of
    a [3,5,N] array, i.e. columns; translation and hwf stay), hwf column
    appended, images sorted by filename; writes poses.npy and
    sparse_points.ply exactly like the reference, plus poses_bounds.npy
    with LLFF near/far percentile bounds from the visible 3D points
    (which the reference's downstream LLFF loaders consume). Verified
    against the dataset's shipped poses_bounds.npy."""
    sparse = os.path.join(scenedir, "sparse", "0")
    cameras, images, points = read_model(sparse)
    cam = cameras[min(cameras)]
    hwf = np.array([cam.height, cam.width,
                    intrinsics_from_camera(cam)[0, 0]], dtype=np.float64)

    im_ids = sorted(images)
    w2c = np.zeros((len(im_ids), 4, 4))
    for k, im_id in enumerate(im_ids):
        im = images[im_id]
        w2c[k, :3, :3] = qvec2rotmat(im.qvec)
        w2c[k, :3, 3] = im.tvec
        w2c[k, 3, 3] = 1.0
    c2w = np.linalg.inv(w2c)

    # [r, -u, t] -> [-u, r, -t]: reorder rotation COLUMNS to
    # (col1, col0, -col2); translation column unchanged
    poses = np.concatenate(
        [c2w[:, :3, 1:2], c2w[:, :3, 0:1], -c2w[:, :3, 2:3],
         c2w[:, :3, 3:4]], axis=2)  # [N, 3, 4]
    poses = np.concatenate(
        [poses, np.broadcast_to(hwf.reshape(1, 3, 1),
                                (len(im_ids), 3, 1))], axis=2)  # [N, 3, 5]

    names = [images[i].name for i in im_ids]
    perm = np.argsort(names)

    pts = np.stack([points[p].xyz for p in points]) if points else \
        np.zeros((0, 3))
    _write_ply_points(os.path.join(scenedir, "sparse_points.ply"), pts)
    np.save(os.path.join(scenedir, "poses.npy"), poses[perm])

    # LLFF bounds: per-image z-depth percentiles of the points it sees
    id_to_row = {im_id: k for k, im_id in enumerate(im_ids)}
    depths = [[] for _ in im_ids]
    for p in points.values():
        for im_id in p.image_ids:
            row = id_to_row.get(int(im_id))
            if row is not None:
                z = w2c[row, 2, :3] @ p.xyz + w2c[row, 2, 3]
                depths[row].append(z)
    bounds = np.zeros((len(im_ids), 2))
    for k, ds in enumerate(depths):
        if ds:
            ds = np.asarray(ds)
            bounds[k] = (np.percentile(ds, 0.1), np.percentile(ds, 99.9))
        else:
            bounds[k] = (0.01, 1.0)
    flat = poses.reshape(len(im_ids), -1)
    np.save(os.path.join(scenedir, "poses_bounds.npy"),
            np.concatenate([flat, bounds], axis=1)[perm])
    return poses[perm], bounds[perm]
