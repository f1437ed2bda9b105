"""Distributed bundle adjustment over a device mesh (BASELINE.md config 5).

The reference has no distributed anything (std::thread + mutexes on one CPU,
SURVEY.md §2.3); this module is the TPU-native scaling axis: the observation
table shards across a 1-D mesh ('obs' axis) while poses/points/rig replicate
— every Hessian-vector product inside the PCG loop reduces its partial
segment-sums with `psum` over ICI (optim/lm.py `axis_name` hook). This is
the faithful analogue of sharded Schur-block reduction: the reduced-system
blocks (U_k, V_p, gradient) are exactly what gets all-reduced.

Scaling model: per-device work is O(O / n_devices) per CG step; collectives
move O(6K + 3P) floats — for K=256 poses / 20k points that is ~250 KB per
psum, ICI-bound, far below the compute time of the sharded row pass.

Tested on a virtual 8-device CPU mesh (tests/test_parallel.py) and dry-run
compiled by __graft_entry__.dryrun_multichip.
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


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()[: (n_devices or len(jax.devices()))]
    return Mesh(np.asarray(devs), (AXIS,))


def pad_observations(obs: Observations, multiple: int) -> Observations:
    """Pad rows (valid=False) so the table divides evenly across the mesh."""
    O = obs.kf.shape[0]
    pad = (-O) % multiple
    if pad == 0:
        return obs
    return Observations(
        kf=jnp.pad(obs.kf, (0, pad)),
        pt=jnp.pad(obs.pt, (0, pad)),
        cam=jnp.pad(obs.cam, (0, pad)),
        uv=jnp.pad(obs.uv, ((0, pad), (0, 0))),
        inv_sigma2=jnp.pad(obs.inv_sigma2, (0, pad)),
        valid=jnp.pad(obs.valid, (0, pad)),
    )


def distributed_bundle_adjust(
    params: BAParams,
    obs: Observations,
    free: FreeMask,
    mesh: Mesh,
    config: LMConfig = LMConfig(),
) -> Tuple[BAParams, jnp.ndarray]:
    """BA with the observation table sharded over `mesh`'s '{AXIS}' axis.

    Parameters/free-masks replicate; each device owns a contiguous row shard;
    the LM/PCG loop is bitwise-identical to the single-device path except the
    scatter-reductions go through psum (deterministic, so every device steps
    the identical LM trajectory).
    """
    n_dev = mesh.devices.size
    obs = pad_observations(obs, n_dev)

    sharded = jax.sharding.NamedSharding(mesh, P(AXIS))
    replicated = jax.sharding.NamedSharding(mesh, P())
    obs = jax.tree.map(lambda x: jax.device_put(x, sharded), obs)
    params = jax.tree.map(lambda x: jax.device_put(x, replicated), params)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), params), jax.tree.map(lambda _: P(AXIS), obs),
                  jax.tree.map(lambda _: P(), free)),
        out_specs=(jax.tree.map(lambda _: P(), params), P()),
    )
    def solve(params_l, obs_l, free_l):
        return lm_solve(params_l, obs_l, free_l, config, axis_name=AXIS)

    return jax.jit(solve)(params, obs, free)


def point_sharded_bundle_adjust(
    params: BAParams,
    obs: Observations,
    free: FreeMask,
    mesh: Mesh,
    config: LMConfig = LMConfig(),
) -> Tuple[BAParams, jnp.ndarray]:
    """BA with POINTS and their observation rows co-sharded over the mesh —
    the >10M-point scaling axis named by parallel/distributed.py's cost
    model: each device owns a contiguous point block plus exactly the rows
    that observe it, so the dominant point-block reductions (V, g_pt, h_pt)
    never leave the device; only the small pose/rig blocks all-reduce.
    (With the point state sharded, the per-psum payload drops from
    O(6K + 3P) to O(6K + 23C) — independent of map size.)

    Host-side prep: points pad to a device multiple; rows bucket by owning
    device (row -> pt // per_dev), each bucket pads to the max bucket length
    with valid=False rows; obs.pt is rewritten to LOCAL indices. Returns
    params with GLOBAL point array (gathered) and the final cost.
    """
    n_dev = mesh.devices.size
    P_n = params.points.shape[0]
    pad_p = (-P_n) % n_dev
    points = jnp.pad(params.points, ((0, pad_p), (0, 0)))
    free_pts = jnp.pad(free.points, (0, pad_p))
    per_dev = (P_n + pad_p) // n_dev

    # bucket observation rows by the device owning their point
    pt_np = np.asarray(obs.pt)
    owner = pt_np // per_dev
    order = np.argsort(owner, kind="stable")
    counts = np.bincount(owner, minlength=n_dev)
    L = int(counts.max()) if len(counts) else 1
    O_cols = {name: np.asarray(getattr(obs, name)) for name in obs._fields}
    out_cols = {name: np.zeros((n_dev * L,) + a.shape[1:], a.dtype)
                for name, a in O_cols.items()}
    start = 0
    for d in range(n_dev):
        rows = order[start:start + counts[d]]
        start += counts[d]
        for name, a in O_cols.items():
            out_cols[name][d * L: d * L + len(rows)] = a[rows]
        # local point indices; padding rows are invalid and point at slot 0
        out_cols["pt"][d * L: d * L + len(rows)] -= d * per_dev
        out_cols["valid"][d * L + len(rows): (d + 1) * L] = False
    obs_s = Observations(**{k: jnp.asarray(v) for k, v in out_cols.items()})

    sharded = NamedSharding(mesh, P(AXIS))
    replicated = NamedSharding(mesh, P())
    obs_s = jax.tree.map(lambda x: jax.device_put(x, sharded), obs_s)
    params_s = BAParams(
        jax.device_put(params.poses, replicated),
        jax.device_put(points, sharded),
        jax.device_put(params.mc, replicated),
        jax.device_put(params.intr, replicated),
    )
    free_s = FreeMask(
        poses=jax.device_put(free.poses, replicated),
        points=jax.device_put(free_pts, sharded),
        mc=free.mc, intr=free.intr,
    )
    cfg = config._replace(points_sharded=True)
    p_specs = BAParams(P(), P(AXIS), P(), P())
    f_specs = FreeMask(P(), P(AXIS), P(), P())

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(p_specs, jax.tree.map(lambda _: P(AXIS), obs_s), f_specs),
        out_specs=(p_specs, P()),
    )
    def solve(params_l, obs_l, free_l):
        return lm_solve(params_l, obs_l, free_l, cfg, axis_name=AXIS)

    out, cost = jax.jit(solve)(params_s, obs_s, free_s)
    return out._replace(points=out.points[:P_n]), cost
