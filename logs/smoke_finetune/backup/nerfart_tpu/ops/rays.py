"""Camera / ray math.

Pixel->ray lifting with skew-aware intrinsics, pixel subsampling, sphere
near/far bounds and exact sphere intersection. Semantics follow the
reference (reference utils/rend_util.py:95-235), including:

- the H/W-*separate* random pixel sampling used for training batches
  (rend_util.py:137-140): `h ~ U{0..H-1}`, `w ~ U{0..W-1}` independently,
  so duplicates are possible — this is part of the training distribution;
- `rays_d` returned *unnormalized* (length encodes the ratio of this ray
  to the principal ray; renderers normalize);
- quaternion [q(4), t(3)] c2w representation support (rend_util.py:114-119).

All functions are jit-friendly with static shapes; random sampling takes an
explicit `jax.random` key instead of global RNG state.
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalizes q [..., 4] (w, x, y, z) and returns R [..., 3, 3].

    Matches reference rend_util.py:76-93.
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    qr, qi, qj, qk = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (qj ** 2 + qk ** 2)
    r01 = 2 * (qj * qi - qk * qr)
    r02 = 2 * (qi * qk + qr * qj)
    r10 = 2 * (qj * qi + qk * qr)
    r11 = 1 - 2 * (qi ** 2 + qk ** 2)
    r12 = 2 * (qj * qk - qi * qr)
    r20 = 2 * (qk * qi - qj * qr)
    r21 = 2 * (qj * qk + qi * qr)
    r22 = 1 - 2 * (qi ** 2 + qj ** 2)
    rows = [jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1)]
    return jnp.stack(rows, axis=-2)


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """R [..., 3, 3] -> q [..., 4] (w, x, y, z). Reference rend_util.py:55-73."""
    r00, r11, r22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    q0 = jnp.sqrt(1.0 + r00 + r11 + r22) / 2.0
    q1 = (R[..., 2, 1] - R[..., 1, 2]) / (4 * q0)
    q2 = (R[..., 0, 2] - R[..., 2, 0]) / (4 * q0)
    q3 = (R[..., 1, 0] - R[..., 0, 1]) / (4 * q0)
    return jnp.stack([q0, q1, q2, q3], axis=-1)


def lift(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Lift pixel coords (x, y, depth z) to homogeneous camera coords.

    Skew-aware, matching reference rend_util.py:95-109.
    x, y, z: [..., N]; intrinsics: [..., 4, 4] (or 3x3 upper-left used).
    Returns [..., N, 4].
    """
    fx = intrinsics[..., 0, 0][..., None]
    fy = intrinsics[..., 1, 1][..., None]
    cx = intrinsics[..., 0, 2][..., None]
    cy = intrinsics[..., 1, 2][..., None]
    sk = intrinsics[..., 0, 1][..., None]

    x_lift = (x - cx + cy * sk / fy - sk * y / fy) / fx * z
    y_lift = (y - cy) / fy * z
    return jnp.stack([x_lift, y_lift, z, jnp.ones_like(z)], axis=-1)


def pixel_grid(H: int, W: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flattened pixel coordinates: i = x (col), j = y (row), each [H*W].

    Row-major (pixel index = j*W + i), matching reference rend_util.py:126-128.
    """
    j, i = jnp.meshgrid(jnp.arange(H, dtype=dtype), jnp.arange(W, dtype=dtype), indexing="ij")
    return i.reshape(-1), j.reshape(-1)


def sample_pixel_inds(key: jax.Array, N_rays: int, H: int, W: int) -> jnp.ndarray:
    """H/W-separately-randomized pixel indices [N_rays] (rend_util.py:137-140)."""
    kh, kw = jax.random.split(key)
    hs = jax.random.randint(kh, (N_rays,), 0, H)
    ws = jax.random.randint(kw, (N_rays,), 0, W)
    return hs * W + ws


def get_rays(
    c2w: jnp.ndarray,
    intrinsics: jnp.ndarray,
    H: int,
    W: int,
    N_rays: int = -1,
    key: Optional[jax.Array] = None,
    select_inds: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Generate rays from camera pose(s).

    c2w: [..., 4, 4] pose matrix, or [..., 7] quaternion+translation.
    intrinsics: [..., 4, 4].
    N_rays > 0: subsample (needs `key` unless `select_inds` given);
    N_rays == -1: all H*W pixels in row-major order.

    Returns (rays_o, rays_d, select_inds):
    rays_o/rays_d [..., N, 3] (rays_d NOT normalized), select_inds [..., N].
    Matches reference rend_util.py:112-165.
    """
    if c2w.shape[-1] == 7:
        cam_loc = c2w[..., 4:]
        R = quat_to_rot(c2w[..., :4])
        p = jnp.zeros((*c2w.shape[:-1], 4, 4), dtype=c2w.dtype)
        p = p.at[..., :3, :3].set(R)
        p = p.at[..., :3, 3].set(cam_loc)
        p = p.at[..., 3, 3].set(1.0)
    else:
        cam_loc = c2w[..., :3, 3]
        p = c2w

    prefix = p.shape[:-2]
    i, j = pixel_grid(H, W, dtype=jnp.result_type(c2w, jnp.float32))

    if select_inds is None:
        if N_rays > 0:
            N_rays = min(N_rays, H * W)
            assert key is not None, "get_rays with N_rays>0 needs a PRNG key"
            select_inds = sample_pixel_inds(key, N_rays, H, W)
        else:
            select_inds = jnp.arange(H * W)
    flat_inds = select_inds.reshape(-1) if select_inds.ndim > 1 else select_inds
    i = jnp.broadcast_to(i[flat_inds], (*prefix, flat_inds.shape[0]))
    j = jnp.broadcast_to(j[flat_inds], (*prefix, flat_inds.shape[0]))
    select_inds = jnp.broadcast_to(flat_inds, (*prefix, flat_inds.shape[0]))

    # [..., N, 4]
    pixel_points_cam = lift(i, j, jnp.ones_like(i), intrinsics=intrinsics)
    # world = (p @ pts^T)^T  — left-multiply by c2w (rend_util.py:150-159).
    # Full f32 precision: camera math is tiny but errors shift every ray.
    world_coords = jnp.einsum("...ij,...nj->...ni", p, pixel_points_cam,
                              precision=jax.lax.Precision.HIGHEST)[..., :3]
    rays_d = world_coords - cam_loc[..., None, :]
    rays_o = jnp.broadcast_to(cam_loc[..., None, :], rays_d.shape)
    return rays_o, rays_d, select_inds


def near_far_from_sphere(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, r: float = 1.0, keepdim: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Conservative near/far from a bounding sphere (rend_util.py:168-186).

    rays_d must be normalized. far is clamped to >= r (reference's trick).
    """
    ray_cam_dot = jnp.sum(rays_o * rays_d, axis=-1, keepdims=keepdim)
    mid = -ray_cam_dot
    near = jnp.clip(mid - r, a_min=0.0)
    far = jnp.clip(mid + r, a_min=r)
    return near, far


def get_sphere_intersection(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, r: float = 1.0
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact ray-sphere intersection (rend_util.py:189-211).

    Returns (near [..., 1], far [..., 1], mask_intersect [..., 1]);
    non-intersecting rays get near=far=0.
    """
    rayso_norm_square = jnp.sum(rays_o ** 2, axis=-1, keepdims=True)
    ray_cam_dot = jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    under_sqrt = ray_cam_dot ** 2 + r ** 2 - rayso_norm_square
    mask = under_sqrt > 0
    sqrt = jnp.sqrt(jnp.where(mask, under_sqrt, 0.0))
    near = jnp.where(mask, -sqrt - ray_cam_dot, 0.0)
    far = jnp.where(mask, sqrt - ray_cam_dot, 0.0)
    return jnp.clip(near, a_min=0.0), jnp.clip(far, a_min=0.0), mask


def get_dvals_from_radius(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, rs: jnp.ndarray, far_end: bool = True
) -> jnp.ndarray:
    """Depth along ray at which |point| == rs (rend_util.py:214-235)."""
    rayso_norm_square = jnp.sum(rays_o ** 2, axis=-1, keepdims=True)
    ray_cam_dot = jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    under_sqrt = rs ** 2 - (rayso_norm_square - ray_cam_dot ** 2)
    sqrt = jnp.sqrt(under_sqrt)
    if far_end:
        return -ray_cam_dot + sqrt
    return jnp.clip(-ray_cam_dot - sqrt, a_min=0.0)


def lin2img(tensor: jnp.ndarray, H: int, W: int, batched: bool = False) -> jnp.ndarray:
    """[(B,) H*W, C] -> [(B,) C, H, W] (rend_util.py:238-248)."""
    *_, num_samples, channels = tensor.shape
    assert num_samples == H * W
    if batched:
        B = tensor.shape[0]
        return tensor.transpose(0, 2, 1).reshape(B, channels, H, W)
    return tensor.transpose(1, 0).reshape(channels, H, W)
