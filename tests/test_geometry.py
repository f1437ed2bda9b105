import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multicol_slam_tpu.utils.geometry import (
    cayley_to_hom,
    cayley_to_rot,
    essential_from_relative,
    hom_compose,
    hom_inverse,
    hom_to_cayley,
    horner,
    quat_to_rot,
    ray_epipolar_distance,
    rot_to_cayley,
    rot_to_quat,
    sim3_apply,
    sim3_compose,
    sim3_inverse,
    triangulate_midpoint,
)

RNG = np.random.default_rng(0)


def random_cayley(n=8, scale=0.5):
    return jnp.asarray(RNG.normal(size=(n, 3)) * scale, jnp.float32)


def test_cayley_rot_roundtrip():
    c = random_cayley()
    R = cayley_to_rot(c)
    # orthonormal, det +1
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
    c2 = rot_to_cayley(R)
    np.testing.assert_allclose(c2, c, atol=1e-5)


def test_cayley_identity():
    R = cayley_to_rot(jnp.zeros(3))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)


def test_hom_roundtrip_and_inverse():
    c6 = jnp.asarray(RNG.normal(size=(5, 6)) * 0.5, jnp.float32)
    M = cayley_to_hom(c6)
    np.testing.assert_allclose(hom_to_cayley(M), c6, atol=1e-5)
    Minv = hom_inverse(M)
    prod = hom_compose(M, Minv)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-5)


def test_quat_roundtrip():
    c = random_cayley(16, 1.5)
    R = cayley_to_rot(c)
    q = rot_to_quat(R)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-5)
    R2 = quat_to_rot(q)
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_horner_matches_polyval():
    coeffs = jnp.asarray(RNG.normal(size=(12,)), jnp.float32)
    x = jnp.asarray(RNG.normal(size=(7,)), jnp.float32)
    want = np.polyval(np.asarray(coeffs)[::-1], np.asarray(x))
    got = horner(coeffs, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_triangulate_midpoint_exact():
    X = jnp.asarray(RNG.normal(size=(10, 3)) + np.array([0, 0, 5.0]), jnp.float32)
    o1 = jnp.zeros((10, 3), jnp.float32)
    o2 = jnp.broadcast_to(jnp.asarray([1.0, 0, 0], jnp.float32), (10, 3))
    d1 = X - o1
    d2 = X - o2
    d1 = d1 / jnp.linalg.norm(d1, axis=-1, keepdims=True)
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    Xt, lam1, lam2 = triangulate_midpoint(o1, d1, o2, d2)
    np.testing.assert_allclose(Xt, X, atol=1e-3)
    assert np.all(np.asarray(lam1) > 0) and np.all(np.asarray(lam2) > 0)


def test_sim3_ops():
    cR = random_cayley(4)
    R = cayley_to_rot(cR)
    t = jnp.asarray(RNG.normal(size=(4, 3)), jnp.float32)
    s = jnp.asarray(RNG.uniform(0.5, 2.0, size=(4,)), jnp.float32)
    X = jnp.asarray(RNG.normal(size=(4, 3)), jnp.float32)
    Y = sim3_apply(R, t, s, X)
    Ri, ti, si = sim3_inverse(R, t, s)
    X2 = sim3_apply(Ri, ti, si, Y)
    np.testing.assert_allclose(X2, X, atol=1e-5)
    Rc, tc, sc = sim3_compose(R, t, s, Ri, ti, si)
    np.testing.assert_allclose(Rc, np.broadcast_to(np.eye(3), Rc.shape), atol=1e-5)
    np.testing.assert_allclose(sc, 1.0, atol=1e-5)
    np.testing.assert_allclose(tc, 0.0, atol=1e-5)


def test_epipolar_distance_zero_for_true_matches():
    """Rays corresponding to the same 3-D point must satisfy the epipolar
    constraint through E built from the relative pose (misc.cpp:54-86)."""
    c6 = jnp.asarray([0.1, -0.2, 0.05, 0.3, 0.1, -0.2], jnp.float32)
    M12 = cayley_to_hom(c6)  # frame1 <- frame2
    X2 = jnp.asarray(RNG.normal(size=(20, 3)) + np.array([0, 0, 3.0]), jnp.float32)
    X1 = jnp.einsum("ij,nj->ni", M12[:3, :3], X2) + M12[:3, 3]
    r1 = X1 / jnp.linalg.norm(X1, axis=-1, keepdims=True)
    r2 = X2 / jnp.linalg.norm(X2, axis=-1, keepdims=True)
    E = essential_from_relative(M12)
    d = ray_epipolar_distance(r2, E, r1)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-4)
    # and a perturbed ray violates it
    r2_bad = r2.at[:, 0].add(0.1)
    r2_bad = r2_bad / jnp.linalg.norm(r2_bad, axis=-1, keepdims=True)
    d_bad = ray_epipolar_distance(r2_bad, E, r1)
    assert float(jnp.median(d_bad)) > 1e-3


def test_jit_and_vmap_compatible():
    f = jax.jit(lambda c: hom_to_cayley(hom_inverse(cayley_to_hom(c))))
    c6 = jnp.asarray(RNG.normal(size=(3, 6)) * 0.5, jnp.float32)
    out = f(c6)
    assert out.shape == (3, 6)
