"""Novel-view camera path generation (reference render.py:21-132,
tools/render_view.py — all five paths active, matching the tools/ variant
where render.py has them commented out but still on the CLI surface).

Host-side numpy (camera counts are tiny); scipy Slerp for interpolation.

Provenance note: `normalize`/`view_matrix`/`look_at`/`poses_avg` mirror the
reference's render.py:21-63 essentially verbatim — they are the standard
4-12-line look-at / pose-averaging math whose exact semantics (axis order,
epsilon, up-vector convention) must match for golden camera-path parity.
The path generators below (interpolation/circle/spiral/spherical_spiral)
are restructured original implementations.
"""
import math
from typing import List, Optional

import numpy as np


def normalize(vec: np.ndarray, axis: int = -1) -> np.ndarray:
    return vec / (np.linalg.norm(vec, axis=axis, keepdims=True) + 1e-9)


def view_matrix(forward: np.ndarray, up: np.ndarray,
                cam_location: np.ndarray) -> np.ndarray:
    """(reference render.py:25-37)."""
    rot_z = normalize(forward)
    rot_x = normalize(np.cross(up, rot_z))
    rot_y = normalize(np.cross(rot_z, rot_x))
    mat = np.stack((rot_x, rot_y, rot_z, cam_location), axis=-1)
    hom_vec = np.array([[0., 0., 0., 1.]])
    if len(mat.shape) > 2:
        hom_vec = np.tile(hom_vec, [mat.shape[0], 1, 1])
    return np.concatenate((mat, hom_vec), axis=-2)


def look_at(cam_location: np.ndarray, point: np.ndarray,
            up=np.array([0., -1., 0.])) -> np.ndarray:
    """openCV convention (reference render.py:54-63)."""
    forward = normalize(point - cam_location)
    return view_matrix(forward, up, cam_location)


def poses_avg(poses: np.ndarray) -> np.ndarray:
    """The reference's active variant anchors on pose 0 ('FOR GIRL',
    render.py:40-51)."""
    center = poses[0, :3, 3]
    forward = poses[0, :3, 2]
    up = poses[0, :3, 1]
    return view_matrix(forward, up, center)


def poses_avg_mean(poses: np.ndarray) -> np.ndarray:
    """The original nerf-style average (render_view_.py variant)."""
    center = poses[:, :3, 3].mean(0)
    forward = poses[:, :3, 2].sum(0)
    up = poses[:, :3, 1].sum(0)
    return view_matrix(forward, up, center)


def c2w_track_spiral(c2w: np.ndarray, up_vec: np.ndarray, rads: np.ndarray,
                     focus: float, zrate: float, rots: int, N: int,
                     rot_rad: float = 0.3) -> List[np.ndarray]:
    """Circle around the center pose looking at the focus point
    (reference render.py:66-110: the active implementation circles at
    radius `rot_rad` in the world xy-plane)."""
    focus_in_cam = np.array([0, 0, focus, 1.])  # openCV convention
    focus_in_world = np.dot(c2w[:3, :4], focus_in_cam)
    center = c2w[:3, 3].reshape(3)
    tracks = []
    for theta in np.linspace(0, 2 * np.pi, N + 1)[:-1]:
        cam_location = np.array([
            center[0] + rot_rad * np.cos(theta),
            center[1] + rot_rad * np.sin(theta),
            center[2]])
        tracks.append(look_at(cam_location, focus_in_world, up=up_vec))
    return tracks


def smoothed_motion_interpolation(full_range: float, num_samples: int,
                                  uniform_proportion: float = 1 / 3.
                                  ) -> np.ndarray:
    """Ease-in/out angle schedule (reference render.py:113-132)."""
    half_acc_proportion = (1 - uniform_proportion) / 2.
    num_uniform_acc = max(math.ceil(num_samples * half_acc_proportion), 2)
    num_uniform = max(math.ceil(num_samples * uniform_proportion), 2)
    seg_velocity = np.arange(num_uniform_acc)
    seg_angle = np.cumsum(seg_velocity)
    ratio = full_range / (2.0 * seg_angle.max()
                          + seg_velocity.max() * num_uniform)
    seg_acc = seg_angle * ratio
    acc_angle = seg_acc.max()
    seg_uniform = np.linspace(acc_angle, full_range - acc_angle,
                              num_uniform + 2)[1:-1]
    return np.concatenate([seg_acc, seg_uniform,
                           full_range - np.flip(seg_acc)])


def spiral_path(c2ws: np.ndarray, num_views: int, rot_percentile: int = 85,
                rot_rad: float = 0.3) -> np.ndarray:
    """The reference render.py's active 'spiral' path (render.py:323-329)."""
    c2w_center = poses_avg(c2ws)
    up = c2ws[:, :3, 1].sum(0)
    rads = np.percentile(np.abs(c2ws[:, :3, 3]), rot_percentile, 0)
    focus_distance = np.mean(np.linalg.norm(c2ws[:, :3, 3], axis=-1))
    tracks = c2w_track_spiral(c2w_center, up, rads, focus_distance * 0.8,
                              zrate=0.0, rots=1, N=num_views, rot_rad=rot_rad)
    return np.stack(tracks)


def interpolation_path(c2ws: np.ndarray, num_views: int) -> np.ndarray:
    """Slerp+lerp through all input views (reference render.py:421-436 /
    tools/render_view.py)."""
    from scipy.interpolate import interp1d
    from scipy.spatial.transform import Rotation as R
    from scipy.spatial.transform import Slerp

    key_rots = R.from_matrix(c2ws[:, :3, :3])
    key_times = list(range(len(key_rots)))
    slerp = Slerp(key_times, key_rots)
    interp = interp1d(key_times, c2ws[:, :3, 3], axis=0)
    out = []
    for i in range(num_views):
        time = float(i) / num_views * (len(c2ws) - 1)
        c2w = np.eye(4)
        c2w[:3, :3] = slerp(time).as_matrix()
        c2w[:3, 3] = interp(time)
        out.append(c2w)
    return np.stack(out)


def small_circle_path(c2ws: np.ndarray, num_views: int,
                      view_ids: List[int]) -> np.ndarray:
    """Interpolate along the small circle through three views
    (reference render.py:386-416)."""
    from scipy.spatial.transform import Rotation as R

    assert len(view_ids) == 3, \
        "select three views on a small circle, in CCW order (from above)"
    centers = c2ws[view_ids, :3, 3]
    radius = np.max(np.linalg.norm(centers, axis=-1))
    centers = centers * radius / np.linalg.norm(centers, axis=-1,
                                                keepdims=True)
    vec0 = centers[1] - centers[0]
    vec1 = centers[2] - centers[0]
    up_vec = normalize(np.cross(vec0, vec1))
    len_chord = np.linalg.norm(vec1, axis=-1)
    full_angle = np.arcsin(len_chord / 2 / radius) * 2.
    all_angles = smoothed_motion_interpolation(full_angle, num_views)
    rots = R.from_rotvec(all_angles[:, None] * up_vec[None, :])
    centers_path = rots.apply(centers[0])
    return look_at(centers_path, np.zeros_like(centers_path), up=-up_vec)


def great_circle_path(c2ws: np.ndarray, num_views: int,
                      view_ids: List[int]) -> np.ndarray:
    """Interpolate along the great circle through two views
    (reference render.py:441-477)."""
    from scipy.spatial.transform import Rotation as R

    assert len(view_ids) == 2, \
        "select two views on a great circle, in CCW order (from above)"
    view0, view1 = view_ids
    c0 = c2ws[view0, :3, 3]
    c1 = c2ws[view1, :3, 3]
    radius = max(np.linalg.norm(c0), np.linalg.norm(c1))
    c0 = c0 * radius / np.linalg.norm(c0)
    c1 = c1 * radius / np.linalg.norm(c1)
    up_vec = normalize(np.cross(c0, c1))
    len_chord = np.linalg.norm(c0 - c1, axis=-1)
    full_angle = np.arcsin(len_chord / 2 / radius) * 2.
    all_angles = smoothed_motion_interpolation(full_angle, num_views)
    rots = R.from_rotvec(all_angles[:, None] * up_vec[None, :])
    centers = rots.apply(c0)
    return look_at(centers, np.zeros_like(centers), up=-up_vec)


def spherical_spiral_path(c2ws: np.ndarray, num_views: int,
                          view_ids: List[int], up_angle: float = np.pi / 3.,
                          n_rots: float = 2.2) -> np.ndarray:
    """Spherical spiral from a small circle of three views
    (reference render.py:335-380)."""
    from scipy.spatial.transform import Rotation as R

    assert len(view_ids) == 3, \
        "select three views on a small circle, in CCW order (from above)"
    centers = c2ws[view_ids, :3, 3]
    radius = np.max(np.linalg.norm(centers, axis=-1))
    centers = centers * radius / np.linalg.norm(centers, axis=-1,
                                                keepdims=True)
    vec0 = centers[1] - centers[0]
    vec1 = centers[2] - centers[0]
    up_vec = normalize(np.cross(vec0, vec1))
    sphere_thetas = np.linspace(0, np.pi * 2. * n_rots, num_views)
    sphere_phis = np.linspace(0, up_angle, num_views)
    focus_center = np.zeros([3])
    rots_theta = R.from_rotvec(sphere_thetas[:, None] * up_vec[None, :])
    render_centers = rots_theta.apply(centers[0])
    horizontal_vec = normalize(np.cross(
        render_centers - focus_center[None, :], up_vec[None, :], axis=-1))
    rots_phi = R.from_rotvec(sphere_phis[:, None] * horizontal_vec)
    render_centers = rots_phi.apply(render_centers)
    return look_at(render_centers, focus_center[None, :], up=-up_vec)


def generate_camera_path(camera_path: str, c2ws: np.ndarray, num_views: int,
                         camera_inds: Optional[str] = None,
                         rot_percentile: int = 85,
                         rot_rad: float = 0.3) -> np.ndarray:
    """Dispatch matching the render.py CLI surface (render.py:315-480)."""
    if camera_path == "spiral":
        return spiral_path(c2ws, num_views, rot_percentile, rot_rad)
    ids = ([int(v) for v in camera_inds.split(",")]
           if camera_inds else [])
    if camera_path == "interpolation":
        return interpolation_path(c2ws, num_views)
    if camera_path == "small_circle":
        return small_circle_path(c2ws, num_views, ids)
    if camera_path == "great_circle":
        return great_circle_path(c2ws, num_views, ids)
    if camera_path == "spherical_spiral":
        return spherical_spiral_path(c2ws, num_views, ids)
    raise RuntimeError(
        "Please choose render type between [spiral, interpolation, "
        "small_circle, great_circle, spherical_spiral]")
