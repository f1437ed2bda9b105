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
