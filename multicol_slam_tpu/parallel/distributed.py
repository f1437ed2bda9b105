"""Multi-host distributed bundle adjustment (BASELINE.md config 5).

Extends parallel/ba.py's single-process mesh to N processes x M local
devices via `jax.distributed`: one process per host, a 1-D global mesh over
ALL devices, the observation table sharded over it, parameters replicated.
The LM/PCG loop (optim/lm.py `axis_name` hook) is unchanged — its
segment-sum reductions become global psums.

Cost model (why this layout):
- Per-CG-step compute is O(n_obs / n_devices) rows x ~500 flops — the
  sharded axis carries all the work.
- Per-CG-step communication is ONE all-reduce of the reduced system:
  O(6K + 3P + 6C + 17C) floats (~250 KB per psum at K=256/P=20k, ~700 KB at
  the 64-KF/50k-pt large-map config). Within a slice this rides ICI
  (~100 GB/s/link: tens of microseconds); across hosts it rides DCN
  (~25-100 Gb/s: ~0.1-0.3 ms). The all-reduce is latency-bound, so scaling
  efficiency stays high as long as the per-device row shard takes longer
  than one DCN round trip — i.e. n_obs/n_devices >~ 10k rows. Poses and
  points replicate because they are small relative to the observation table
  (the classic BA-in-the-large split); sharding points (the next axis at
  >10M points) would turn the psum into a reduce_scatter over the point
  blocks.

The reference has no distributed anything (std::thread + mutexes on one
CPU, SURVEY.md §2.3); this is the TPU-native scaling story for its
large-map limit.

Usage (one process per host):
    init_distributed(coordinator, n_procs, proc_id)     # jax.distributed
    mesh = global_mesh()
    out, cost = multihost_bundle_adjust(params, obs_local, free, mesh)
Tested with N=2 local CPU processes in tests/test_multihost.py (the
standard way to validate a jax.distributed path without a pod).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multicol_slam_tpu.optim.lm import LMConfig, lm_solve
from multicol_slam_tpu.optim.problem import BAParams, FreeMask, Observations

AXIS = "obs"


def init_distributed(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_ids: Optional[list] = None,
) -> None:
    """Initialize the jax.distributed runtime (call ONCE per process, before
    any jax computation). On a TPU pod this is normally automatic; explicit
    arguments support CPU/GPU clusters and local multi-process tests."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def global_mesh() -> Mesh:
    """1-D mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (AXIS,))


def shard_rows_for_process(n_rows: int, mesh: Mesh) -> Tuple[int, int]:
    """(start, stop) of the observation rows this process owns under an even
    row split over the global device order. n_rows must be divisible by the
    global device count (pad with valid=False rows first)."""
    devs = list(mesh.devices.ravel())
    per_dev = n_rows // len(devs)
    mine = [i for i, d in enumerate(devs) if d.process_index == jax.process_index()]
    return mine[0] * per_dev, (mine[-1] + 1) * per_dev


def multihost_bundle_adjust(
    params: BAParams,
    obs_local: Observations,
    free: FreeMask,
    mesh: Mesh,
    config: LMConfig = LMConfig(),
) -> Tuple[BAParams, jnp.ndarray]:
    """BA over a multi-process mesh. `obs_local` holds ONLY this process's
    row shard (length = n_global_rows / n_processes, divisible by the local
    device count); params/free must be identical on every process.

    Single-process meshes work too (obs_local = all rows), so this is a
    strict superset of parallel.ba.distributed_bundle_adjust.
    """
    sharded = NamedSharding(mesh, P(AXIS))
    replicated = NamedSharding(mesh, P())

    def to_global_sharded(x):
        return jax.make_array_from_process_local_data(sharded, np.asarray(x))

    def to_global_replicated(x):
        a = np.asarray(x)
        return jax.make_array_from_callback(a.shape, replicated, lambda idx: a[idx])

    obs_g = jax.tree.map(to_global_sharded, obs_local)
    params_g = jax.tree.map(to_global_replicated, params)
    free_g = jax.tree.map(to_global_replicated, free)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), params_g),
                  jax.tree.map(lambda _: P(AXIS), obs_g),
                  jax.tree.map(lambda _: P(), free_g)),
        out_specs=(jax.tree.map(lambda _: P(), params_g), P()),
    )
    def solve(params_l, obs_l, free_l):
        return lm_solve(params_l, obs_l, free_l, config, axis_name=AXIS)

    return jax.jit(solve)(params_g, obs_g, free_g)


# ---------------------------------------------------------------------------
# Large-map synthetic BA problem (the distributed benchmark workload)
# ---------------------------------------------------------------------------

def make_large_ba_problem(
    n_kfs: int = 64,
    n_points: int = 50_000,
    n_obs: int = 500_000,
    n_cams: int = 3,
    noise_px: float = 0.5,
    pose_noise: float = 0.01,
    point_noise: float = 0.05,
    seed: int = 0,
):
    """Large-map BA instance (>=64 KFs / >=50k points / >=500k obs,
    BASELINE.md config 5): a corridor trajectory observing a point cloud
    through a 3-camera rig, with perturbed initial parameters. Returns
    (params_noisy, params_gt, obs, free)."""
    rng = np.random.default_rng(seed)
    from multicol_slam_tpu.optim.problem import project_obs

    intr = _make_intr(n_cams)
    mc = np.zeros((n_cams, 6), np.float32)
    mc[:, 3] = np.linspace(-0.15, 0.15, n_cams)
    poses = np.zeros((n_kfs, 6), np.float32)
    poses[:, 3] = np.linspace(0.0, 0.08 * n_kfs, n_kfs)          # corridor x
    poses[:, 1] = 0.02 * np.sin(np.linspace(0, 4 * np.pi, n_kfs))
    points = np.stack([
        rng.uniform(-1.0, 0.08 * n_kfs + 1.0, n_points),
        rng.normal(0.0, 1.5, n_points),
        rng.uniform(4.0, 10.0, n_points),
    ], -1).astype(np.float32)
    params_gt = BAParams(
        jnp.asarray(poses), jnp.asarray(points), jnp.asarray(mc), jnp.asarray(intr)
    )
    # sample observations biased to nearby keyframes (local visibility)
    kf = rng.integers(0, n_kfs, n_obs).astype(np.int32)
    # points near the keyframe's x position are the visible ones
    px = poses[kf, 3]
    pt = np.clip(
        ((px[:, None] + rng.normal(0, 2.5, (n_obs, 1))) / (0.08 * n_kfs + 2.0)
         * n_points).astype(np.int64), 0, n_points - 1
    )[:, 0]
    order = np.argsort(points[:, 0], kind="stable")
    pt = order[pt].astype(np.int32)
    cam = rng.integers(0, n_cams, n_obs).astype(np.int32)
    uv, z = jax.jit(jax.vmap(
        lambda k, p, c: project_obs(params_gt.poses[k], params_gt.mc[c],
                                    params_gt.intr[c], params_gt.points[p])
    ))(jnp.asarray(kf), jnp.asarray(pt), jnp.asarray(cam))
    uv = np.asarray(uv)
    keep = np.asarray(z) > 0.5
    keep &= (uv[:, 0] > 5) & (uv[:, 0] < 250) & (uv[:, 1] > 5) & (uv[:, 1] < 186)
    uv = uv + rng.normal(0, noise_px, uv.shape)
    obs = Observations(
        jnp.asarray(kf), jnp.asarray(pt), jnp.asarray(cam),
        jnp.asarray(uv, jnp.float32),
        jnp.ones(n_obs, jnp.float32), jnp.asarray(keep),
    )
    noisy = BAParams(
        params_gt.poses + jnp.asarray(
            np.concatenate([np.zeros((1, 6)), rng.normal(0, pose_noise, (n_kfs - 1, 6))]),
            jnp.float32),
        params_gt.points + jnp.asarray(rng.normal(0, point_noise, (n_points, 3)), jnp.float32),
        params_gt.mc, params_gt.intr,
    )
    free = FreeMask(
        poses=jnp.asarray([False] + [True] * (n_kfs - 1)),
        points=jnp.ones(n_points, bool),
    )
    return noisy, params_gt, obs, free


def _make_intr(n_cams: int):
    from multicol_slam_tpu.models.camera import OmniCamera, fit_inverse_poly

    w, h = 256, 192
    pol = [-60.0, 0.0, 1.0 / 60.0, 0.0, 0.0]
    invpol = fit_inverse_poly(pol, rho_max=0.95 * (h / 2.0 + 22.0))
    cams = OmniCamera.from_params(
        [pol] * n_cams, [list(invpol)] * n_cams,
        [[1.0, 0.0, 0.0]] * n_cams,
        [[w / 2.0, h / 2.0]] * n_cams,
        [[w, h]] * n_cams,
    )
    return np.asarray(cams.to_vector())
