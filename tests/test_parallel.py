"""Distributed BA on the virtual 8-device CPU mesh (SURVEY.md §4g)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multicol_slam_tpu.optim.ba import bundle_adjust
from multicol_slam_tpu.optim.problem import BAParams, FreeMask
from multicol_slam_tpu.parallel.ba import distributed_bundle_adjust, make_mesh
from tests.test_optimizer import make_world

RNG = np.random.default_rng(17)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
def test_distributed_ba_matches_single_device():
    params, obs = make_world(K=5, P=60)
    noisy = BAParams(
        params.poses
        + jnp.asarray(np.concatenate([np.zeros((1, 6)), RNG.normal(0, 0.02, (4, 6))]), jnp.float32),
        params.points + jnp.asarray(RNG.normal(0, 0.05, (60, 3)), jnp.float32),
        params.mc,
        params.intr,
    )
    free = FreeMask(poses=jnp.asarray([False] + [True] * 4), points=jnp.ones(60, bool))
    mesh = make_mesh()
    assert mesh.devices.size >= 8
    out_d, cost_d = distributed_bundle_adjust(noisy, obs, free, mesh)
    out_s, cost_s = bundle_adjust(noisy, obs, free, max_iters=15, cg_iters=20)
    # distributed must reach the same optimum (deterministic psum ordering
    # differences allow small float drift)
    np.testing.assert_allclose(np.asarray(out_d.poses), np.asarray(out_s.poses), atol=5e-3)
    err = float(jnp.max(jnp.abs(out_d.poses - params.poses)))
    assert err < 1e-2, f"distributed BA pose error {err}"


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
def test_point_sharded_ba_matches_single_device():
    """The reduce-scatter-style point-sharded layout (points + their rows
    co-sharded, LMConfig.points_sharded — the >10M-point scaling axis named
    by parallel/distributed.py's cost model) must reach the same optimum as
    the single-device solve."""
    from multicol_slam_tpu.parallel.ba import point_sharded_bundle_adjust

    params, obs = make_world(K=5, P=61)  # P not divisible by 8: exercises padding
    noisy = BAParams(
        params.poses
        + jnp.asarray(np.concatenate([np.zeros((1, 6)), RNG.normal(0, 0.02, (4, 6))]), jnp.float32),
        params.points + jnp.asarray(RNG.normal(0, 0.05, (61, 3)), jnp.float32),
        params.mc,
        params.intr,
    )
    free = FreeMask(poses=jnp.asarray([False] + [True] * 4), points=jnp.ones(61, bool))
    mesh = make_mesh()
    out_d, cost_d = point_sharded_bundle_adjust(noisy, obs, free, mesh)
    out_s, cost_s = bundle_adjust(noisy, obs, free, max_iters=15, cg_iters=20)
    np.testing.assert_allclose(np.asarray(out_d.poses), np.asarray(out_s.poses), atol=5e-3)
    np.testing.assert_allclose(np.asarray(out_d.points), np.asarray(out_s.points), atol=5e-3)
    assert float(cost_d) <= float(cost_s) * 1.05 + 1e-6


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
def test_distributed_ba_with_ragged_obs_count():
    """Observation counts not divisible by n_devices must be padded safely."""
    params, obs = make_world(K=3, P=31)
    # chop to a prime row count
    n = 397
    obs = jax.tree.map(lambda x: x[:n], obs)
    free = FreeMask(poses=jnp.asarray([False, True, True]), points=jnp.ones(31, bool))
    noisy = params._replace(points=params.points + 0.03)
    mesh = make_mesh()
    out, cost = distributed_bundle_adjust(noisy, obs, free, mesh)
    assert np.isfinite(float(cost))
    err = float(jnp.max(jnp.abs(out.points - params.points)))
    assert err < 2e-2
