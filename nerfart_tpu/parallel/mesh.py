"""Multi-chip parallelism: device mesh + sharding helpers.

The reference's two parallelism strategies are both data parallelism over
rays/images (DataParallel over the ray dim, volsdf.py:632-633; DDP over
images with NCCL gradient allreduce, train.py:84-155 + dist_util.py).
The TPU-native equivalent (SURVEY.md §2.6):

- ONE `jax.sharding.Mesh` over all chips with a `data` axis;
- the ray batch is sharded over `data` via `with_sharding_constraint`
  inside the jitted step — per-ray rendering is embarrassingly parallel,
  so the only collectives XLA inserts are the loss mean-reduction and the
  gradient all-reduce (riding ICI), exactly DDP's communication pattern
  but compiled into the same program as the compute;
- parameters stay replicated (they are ~1.5M floats — replication is the
  right layout for MLPs this small; `data_parallel_sharding` builds the
  per-ray NamedSharding used to lay out host batches).

Host orchestration (jax.distributed.initialize for multi-host) is wired
in `init_distributed`.
"""
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed():
    """Multi-host init (TPU pods). No-op on a single host.

    Replaces the reference's `dist.init_process_group` / SLURM bootstrap
    (reference utils/dist_util.py:13-70). Two modes:
      - TPU pods / managed clusters: COORDINATOR_ADDRESS (or MEGASCALE_*)
        is set by the launcher and jax auto-detects process id/count.
      - explicit rendezvous (the reference's manual `--ddp` torchrun path,
        dist_util.py:42-70): NERFART_NUM_PROCESSES + NERFART_PROCESS_ID
        name this process against COORDINATOR_ADDRESS (host:port);
        exercised cross-process by tests/test_multihost.py."""
    import os
    coord = (os.environ.get("COORDINATOR_ADDRESS")
             or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if coord is None:
        return
    nproc = os.environ.get("NERFART_NUM_PROCESSES")
    pid = os.environ.get("NERFART_PROCESS_ID")
    if nproc is not None and pid is not None:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=int(nproc),
                                   process_id=int(pid))
    else:
        jax.distributed.initialize()


def get_rank() -> int:
    """Process index (reference utils/dist_util.py get_rank)."""
    return jax.process_index()


def get_world_size() -> int:
    """Process count (reference dist_util.py get_world_size)."""
    return jax.process_count()


def is_master() -> bool:
    """(reference dist_util.py is_master)."""
    return jax.process_index() == 0


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D mesh over (up to) all local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def auto_mesh(n_rays: Optional[int] = None) -> Optional[Mesh]:
    """Mesh over all devices when >1 is present, else None.

    The CLI entry points call this to make multi-chip the default (the
    reference requires an explicit --ddp + torchrun; on TPU one process
    sees all local chips, so sharding can just be on). If `n_rays` is
    given and not divisible by the device count, the mesh is trimmed to
    the largest power-of-two divisor so ray batches always split evenly.
    """
    n = len(jax.devices())
    if n <= 1:
        return None
    if n_rays is not None:
        # largest d <= n_devices that divides n_rays (halving from a
        # non-power-of-two count can skip valid divisors, e.g. 6 -> 3 -> 1
        # misses 2 for n_rays=64)
        n = max((d for d in range(1, n + 1) if n_rays % d == 0),
                default=1)
        if n <= 1:
            return None
    return make_mesh(n)


def shard_map_render(render_flat, mesh: Mesh, n_rays: int, axis: str = "data"):
    """SPMD-ify a flat-ray render function over the mesh's ray axis.

    render_flat: (params, rays_o [M,3], rays_d [M,3]) -> pytree whose
    leaves all have the ray axis leading. Returns a function with the same
    signature that pads M=n_rays to a device-count multiple, runs each
    shard on its own chip via shard_map (rays are embarrassingly parallel:
    zero collectives — the TPU analog of the reference's
    nn.DataParallel(dim=ray), volsdf.py:632-633), and unpads.

    n_rays must be the static ray count (image H*W) so padding is static
    under jit.
    """
    from jax.experimental.shard_map import shard_map

    n_dev = int(np.prod(mesh.devices.shape))
    n_pad = pad_to_multiple(n_rays, n_dev)

    inner = shard_map(render_flat, mesh=mesh,
                      in_specs=(P(), P(axis), P(axis)),
                      out_specs=P(axis), check_rep=False)

    def wrapped(params, rays_o, rays_d):
        pad = n_pad - n_rays
        if pad:
            rays_o = jnp.concatenate(
                [rays_o, jnp.broadcast_to(rays_o[-1:], (pad, 3))])
            rays_d = jnp.concatenate(
                [rays_d, jnp.broadcast_to(rays_d[-1:], (pad, 3))])
        out = inner(params, rays_o, rays_d)
        if pad:
            out = jax.tree_util.tree_map(lambda x: x[:n_rays], out)
        return out

    return wrapped


def data_parallel_sharding(mesh: Mesh, ray_axis: int = 1,
                           ndim: int = 3) -> NamedSharding:
    """NamedSharding that shards the ray axis over the mesh's data axis."""
    spec = [None] * ndim
    spec[ray_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def shard_rays(x: jnp.ndarray, mesh: Mesh, ray_axis: int = 1) -> jnp.ndarray:
    """Constrain a per-ray tensor to be sharded over chips (in-jit)."""
    spec = [None] * x.ndim
    spec[ray_axis] = "data"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
