import numpy as np
import jax.numpy as jnp
import pytest

from reze_tpu.core import math3d as m3
import oracle


def rand_quat(rng, n=()):
    q = rng.normal(size=n + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_quat_mul_matches_oracle(rng):
    a, b = rand_quat(rng), rand_quat(rng)
    got = np.asarray(m3.quat_mul(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, oracle.quat_mul(a, b), atol=1e-6)


def test_quat_rotate_matches_matrix(rng):
    q = rand_quat(rng, (16,))
    v = rng.normal(size=(16, 3))
    got = np.asarray(m3.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    for i in range(16):
        expected = oracle.mat_from_quat(q[i])[:3, :3] @ v[i]
        np.testing.assert_allclose(got[i], expected, atol=1e-5)


def test_quat_slerp_endpoints_and_oracle(rng):
    a, b = rand_quat(rng, (8,)), rand_quat(rng, (8,))
    s0 = np.asarray(m3.quat_slerp(jnp.asarray(a), jnp.asarray(b), jnp.zeros(8)))
    np.testing.assert_allclose(s0, a, atol=1e-6)
    for t in (0.25, 0.5, 0.9):
        got = np.asarray(m3.quat_slerp(jnp.asarray(a), jnp.asarray(b), jnp.full(8, t)))
        for i in range(8):
            exp = oracle.quat_slerp(a[i], b[i], t)
            np.testing.assert_allclose(got[i], exp, atol=1e-5)


def test_slerp_shortest_path(rng):
    a = rand_quat(rng)
    b = -a  # same rotation
    out = np.asarray(m3.quat_slerp(jnp.asarray(a), jnp.asarray(b), jnp.asarray(0.5)))
    # should stay at the same rotation (up to sign)
    assert min(np.linalg.norm(out - a), np.linalg.norm(out + a)) < 1e-4


def test_euler_zxy_matches_reference(rng):
    angles = rng.uniform(-1.2, 1.2, size=(32, 3))
    q = m3.quat_from_euler_zxy(jnp.asarray(angles))
    # cross-check against oracle scalar formula
    for i in range(8):
        exp = oracle.quat_from_euler_zxy(*angles[i])
        np.testing.assert_allclose(np.asarray(q)[i], exp, atol=1e-6)
    # The reference's toEuler is only an approximate inverse of fromEuler
    # (verified against math.ts formulas); exact for small angles.
    small = rng.uniform(-0.05, 0.05, size=(32, 3))
    qs = m3.quat_from_euler_zxy(jnp.asarray(small))
    back = np.asarray(m3.quat_to_euler_zxy(qs))
    np.testing.assert_allclose(back, small, atol=5e-3)


def test_mat3_from_quat_orthonormal(rng):
    q = rand_quat(rng, (8,))
    r = np.asarray(m3.mat3_from_quat(jnp.asarray(q)))
    eye = np.einsum("bij,bkj->bik", r, r)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-6)


def test_mat4_to_quat_roundtrip(rng):
    q = rand_quat(rng, (64,))
    m = m3.mat4_from_quat(jnp.asarray(q))
    back = np.asarray(m3.mat4_to_quat(m))
    # quaternion sign ambiguity
    flip = np.sign(np.sum(back * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(back * flip, q, atol=1e-5)


def test_rigid_inverse(rng):
    q = rand_quat(rng, (8,))
    p = rng.normal(size=(8, 3))
    m = m3.mat4_from_pos_quat(jnp.asarray(p), jnp.asarray(q))
    inv = m3.mat4_inverse_rigid(m)
    prod = np.asarray(jnp.matmul(m, inv))
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)


def test_perspective_depth_range():
    # The reference projection (math.ts:247-271) maps near -> -1 and
    # far -> +1; WebGPU clips z to [0, w], so the *effective* near plane is
    # where z' = 0, at z = 2*n*f/(n+f). We reproduce that exactly.
    n, f = 0.05, 1000.0
    proj = m3.perspective_lh(jnp.asarray(np.pi / 4), jnp.asarray(1.0), jnp.asarray(n), jnp.asarray(f))
    pn = np.asarray(proj) @ np.array([0, 0, n, 1.0])
    pf = np.asarray(proj) @ np.array([0, 0, f, 1.0])
    pz = np.asarray(proj) @ np.array([0, 0, 2 * n * f / (n + f), 1.0])
    assert abs(pn[2] / pn[3] + 1.0) < 1e-5  # near -> -1
    assert abs(pf[2] / pf[3] - 1.0) < 1e-5  # far -> +1
    assert abs(pz[2] / pz[3]) < 1e-5  # effective near -> 0
    assert pn[3] > 0  # +Z forward has positive clip w


def test_look_at_places_eye_at_origin():
    eye = jnp.asarray([1.0, 2.0, 3.0])
    target = jnp.asarray([0.0, 0.0, 0.0])
    view = m3.look_at_lh(eye, target, jnp.asarray([0.0, 1.0, 0.0]))
    p = np.asarray(view) @ np.array([1.0, 2.0, 3.0, 1.0])
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-6)
    # target should be on +Z axis (left-handed forward)
    t = np.asarray(view) @ np.array([0.0, 0.0, 0.0, 1.0])
    assert t[2] > 0
    np.testing.assert_allclose(t[:2], 0.0, atol=1e-6)


def test_ease_in_out():
    ts = jnp.asarray([0.0, 0.25, 0.5, 0.75, 1.0])
    got = np.asarray(m3.ease_in_out(ts))
    exp = [oracle.ease_in_out(float(t)) for t in np.asarray(ts)]
    np.testing.assert_allclose(got, exp, atol=1e-7)
