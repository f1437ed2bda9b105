import jax
import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.ops.ransac import (
    decompose_essential,
    horn_sim3,
    ransac_essential,
    ransac_noncentral_pose,
    ransac_sim3,
    refine_noncentral_pose,
)
from multicol_slam_tpu.utils.geometry import cayley_to_rot

RNG = np.random.default_rng(3)


def make_two_view(n=200, outlier_frac=0.3):
    """Synthetic central two-view problem. Returns rays1, rays2, R21, t21."""
    X1 = RNG.normal(size=(n, 3)) * np.array([2, 2, 1]) + np.array([0, 0, 6.0])
    cay = np.array([0.05, -0.08, 0.03])
    R = np.asarray(cayley_to_rot(jnp.asarray(cay, jnp.float32)), np.float64)
    t = np.array([0.4, 0.1, -0.2])
    t = t / np.linalg.norm(t)
    X2 = X1 @ R.T + t
    r1 = X1 / np.linalg.norm(X1, axis=-1, keepdims=True)
    r2 = X2 / np.linalg.norm(X2, axis=-1, keepdims=True)
    n_out = int(n * outlier_frac)
    bad = RNG.permutation(n)[:n_out]
    r2[bad] = RNG.normal(size=(n_out, 3))
    r2[bad] /= np.linalg.norm(r2[bad], axis=-1, keepdims=True)
    gt_inlier = np.ones(n, bool)
    gt_inlier[bad] = False
    return (
        jnp.asarray(r1, jnp.float32),
        jnp.asarray(r2, jnp.float32),
        R,
        t,
        gt_inlier,
    )


def test_ransac_essential_recovers_pose():
    r1, r2, R_gt, t_gt, gt_inl = make_two_view()
    res = ransac_essential(
        jax.random.PRNGKey(0), r1, r2, jnp.ones(r1.shape[0], bool), n_hyp=256
    )
    # rotation error
    R_est = np.asarray(res.R, np.float64)
    ang = np.degrees(np.arccos(np.clip((np.trace(R_est.T @ R_gt) - 1) / 2, -1, 1)))
    assert ang < 1.0, f"rotation error {ang} deg"
    # translation direction error (sign fixed by cheirality)
    t_est = np.asarray(res.t, np.float64)
    cosd = abs(np.dot(t_est, t_gt))
    assert cosd > 0.995, f"translation direction cos {cosd}"
    # inlier set mostly recovered
    found = np.asarray(res.inliers)
    assert found[gt_inl].mean() > 0.9
    assert found[~gt_inl].mean() < 0.1


def make_rig_pnp(n=150, n_cams=3, outlier_frac=0.3):
    """Synthetic non-central absolute pose problem."""
    # rig extrinsics: cameras offset from body
    Rc = np.stack([np.eye(3)] * n_cams)
    tc = np.stack([[0.2, 0, 0], [-0.1, 0.15, 0], [0, -0.1, 0.1]])[:n_cams]
    # ground-truth body pose (world -> body R_wb, t_wb); Mt = inverse
    cay = np.array([0.1, 0.05, -0.07])
    R_wb = np.asarray(cayley_to_rot(jnp.asarray(cay, jnp.float32)), np.float64)
    t_wb = np.array([0.5, -0.3, 0.8])
    X = RNG.normal(size=(n, 3)) * 3 + np.array([0, 0, 8.0])
    cam = RNG.integers(0, n_cams, n)
    Xb = X @ R_wb.T + t_wb
    rays_body = Xb - tc[cam]
    rays_cam = np.einsum("nji,nj->ni", Rc[cam], rays_body)  # Rc^T applied
    rays_cam /= np.linalg.norm(rays_cam, axis=-1, keepdims=True)
    n_out = int(n * outlier_frac)
    bad = RNG.permutation(n)[:n_out]
    rays_cam[bad] = RNG.normal(size=(n_out, 3))
    rays_cam[bad] /= np.linalg.norm(rays_cam[bad], axis=-1, keepdims=True)
    gt_inl = np.ones(n, bool)
    gt_inl[bad] = False
    Mt_gt = np.eye(4)
    Mt_gt[:3, :3] = R_wb.T
    Mt_gt[:3, 3] = -R_wb.T @ t_wb
    return (
        jnp.asarray(X, jnp.float32),
        jnp.asarray(rays_cam, jnp.float32),
        jnp.asarray(Rc[cam], jnp.float32),
        jnp.asarray(tc[cam], jnp.float32),
        Mt_gt,
        gt_inl,
    )


def test_ransac_noncentral_pose():
    X, rays, Rc, tc, Mt_gt, gt_inl = make_rig_pnp()
    res = ransac_noncentral_pose(
        jax.random.PRNGKey(1), X, rays, Rc, tc, jnp.ones(X.shape[0], bool), n_hyp=192
    )
    Mt = np.asarray(res.Mt, np.float64)
    ang = np.degrees(
        np.arccos(np.clip((np.trace(Mt[:3, :3].T @ Mt_gt[:3, :3]) - 1) / 2, -1, 1))
    )
    terr = np.linalg.norm(Mt[:3, 3] - Mt_gt[:3, 3])
    assert ang < 1.0, f"rotation error {ang}"
    assert terr < 0.05, f"translation error {terr}"
    assert np.asarray(res.inliers)[gt_inl].mean() > 0.9


def test_refine_noncentral_pose():
    X, rays, Rc, tc, Mt_gt, gt_inl = make_rig_pnp(outlier_frac=0.0)
    Mt = np.asarray(
        refine_noncentral_pose(X, rays, Rc, tc, jnp.ones(X.shape[0])), np.float64
    )
    assert np.linalg.norm(Mt[:3, 3] - Mt_gt[:3, 3]) < 1e-2
    ang = np.degrees(
        np.arccos(np.clip((np.trace(Mt[:3, :3].T @ Mt_gt[:3, :3]) - 1) / 2, -1, 1))
    )
    assert ang < 0.2


def test_horn_sim3_exact():
    P = jnp.asarray(RNG.normal(size=(20, 3)), jnp.float32)
    cay = jnp.asarray([0.3, -0.1, 0.2], jnp.float32)
    R_gt = cayley_to_rot(cay)
    s_gt = 1.7
    t_gt = jnp.asarray([1.0, -2.0, 0.5], jnp.float32)
    Q = s_gt * P @ R_gt.T + t_gt
    R, t, s = horn_sim3(P, Q)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-4)
    np.testing.assert_allclose(float(s), s_gt, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=1e-3)


def test_horn_sim3_batched():
    P = jnp.asarray(RNG.normal(size=(5, 3, 3)), jnp.float32)  # 5 minimal sets
    R_gt = cayley_to_rot(jnp.asarray([0.1, 0.2, -0.05], jnp.float32))
    Q = 2.0 * jnp.einsum("ij,smj->smi", R_gt, P) + jnp.asarray([0.3, 0.4, 0.5])
    R, t, s = horn_sim3(P, Q)
    assert R.shape == (5, 3, 3)
    np.testing.assert_allclose(np.asarray(s), 2.0, rtol=1e-3)


def test_ransac_sim3_with_outliers():
    n = 80
    P = RNG.normal(size=(n, 3)).astype(np.float32)
    R_gt = np.asarray(cayley_to_rot(jnp.asarray([0.2, 0.1, -0.3], jnp.float32)))
    Q = 1.5 * P @ R_gt.T + np.array([1, 2, 3], np.float32)
    bad = RNG.permutation(n)[:30]
    Q[bad] += RNG.normal(size=(30, 3)) * 5
    Pj, Qj = jnp.asarray(P), jnp.asarray(Q.astype(np.float32))

    def err_fn(R, t, s):
        pred = s[:, None, None] * jnp.einsum("sij,nj->sni", R, Pj) + t[:, None, :]
        return jnp.linalg.norm(pred - Qj[None], axis=-1) < 0.1

    res = ransac_sim3(jax.random.PRNGKey(2), Pj, Qj, jnp.ones(n, bool), err_fn, n_hyp=300)
    assert float(res.s) == pytest_approx(1.5, 0.05)
    assert int(res.n_inliers) >= 45


def pytest_approx(v, tol):
    class A:
        def __eq__(self, other):
            return abs(other - v) <= tol
    return A()
