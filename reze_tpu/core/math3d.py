"""3D math primitives for the TPU-native MMD engine.

Conventions (identical to the reference engine, see
/root/reference/engine/src/math.ts):

* **Left-handed** coordinate system, +Z forward, +Y up (PMX native).
* Quaternions are ``(..., 4)`` arrays laid out ``[x, y, z, w]`` with Hamilton
  product semantics (``quat_mul(a, b)`` first applies ``b`` then ``a`` when
  rotating column vectors, matching ``Quat.multiply`` at math.ts:77-85).
* Euler angles use MMD's **ZXY** intrinsic order (math.ts:192-231).
* Matrices are ``(..., 4, 4)`` with standard row-by-column math layout and a
  column-vector convention: ``world = M @ [x, y, z, 1]``.  The reference keeps
  column-major flat arrays, so its ``values[c*4+r]`` equals our ``M[r, c]``;
  its ``a.multiply(b)`` equals our ``a @ b``.

All functions are pure jnp, broadcast over leading axes, and are safe to vmap
and jit.  A mirrored NumPy oracle lives in ``tests/oracle.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

IDENTITY_QUAT = (0.0, 0.0, 0.0, 1.0)


def ease_in_out(t: Array) -> Array:
    """Quadratic ease-in-out (math.ts:2-4)."""
    t = jnp.asarray(t)
    return jnp.where(t < 0.5, 2.0 * t * t, 1.0 - jnp.square(-2.0 * t + 2.0) / 2.0)


# ---------------------------------------------------------------------------
# Quaternions ([x, y, z, w])
# ---------------------------------------------------------------------------


def quat_identity(shape=()) -> Array:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 3].set(1.0)


def quat_mul(a: Array, b: Array) -> Array:
    """Hamilton product a*b (math.ts:77-85)."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conj(q: Array) -> Array:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_normalize(q: Array, eps: float = 0.0) -> Array:
    """Normalize; zero-length becomes identity (math.ts:96-100)."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    safe = jnp.where(n > eps, n, 1.0)
    out = q / safe
    ident = jnp.broadcast_to(jnp.asarray(IDENTITY_QUAT, dtype=q.dtype), q.shape)
    return jnp.where(n > eps, out, ident)


def quat_rotate(q: Array, v: Array) -> Array:
    """Rotate vector(s) v by quaternion(s) q: q * v * q^-1 (math.ts:103-124)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_slerp(a: Array, b: Array, t: Array) -> Array:
    """Shortest-path slerp with nlerp fallback above cos>0.9995 (math.ts:156-189)."""
    t = jnp.asarray(t)[..., None]
    cos = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(cos < 0.0, -b, b)
    cos = jnp.abs(cos)

    # nlerp branch
    lin = a + t * (b - a)
    lin = lin / jnp.linalg.norm(lin, axis=-1, keepdims=True)

    # slerp branch (clamp cos to keep acos/sin well-defined where unused)
    cos_c = jnp.clip(cos, -1.0, 0.99951)
    theta0 = jnp.arccos(cos_c)
    sin_theta0 = jnp.sin(theta0)
    theta = theta0 * t
    s0 = jnp.sin(theta0 - theta) / sin_theta0
    s1 = jnp.sin(theta) / sin_theta0
    sph = s0 * a + s1 * b

    return jnp.where(cos > 0.9995, lin, sph)


def quat_from_rotvec(rv: Array) -> Array:
    """Rotation vector (axis*angle, (..., 3)) -> quaternion (..., 4).

    exp map: q = [axis*sin(a/2), cos(a/2)] with a small-angle-safe sinc.
    Used by bone morphs: slerp(identity, q, w) == exp(w*log(q)).
    """
    angle = jnp.linalg.norm(rv, axis=-1, keepdims=True)
    half = 0.5 * angle
    sinc = jnp.where(angle > 1e-8, jnp.sin(half) / jnp.maximum(angle, 1e-12), 0.5)
    return jnp.concatenate([rv * sinc, jnp.cos(half)], axis=-1)


def quat_from_euler_zxy(rot: Array) -> Array:
    """MMD Euler (ZXY order, left-handed) -> quaternion (math.ts:192-206).

    ``rot`` is ``(..., 3)`` = (rotX, rotY, rotZ) in radians.
    """
    half = 0.5 * rot
    sx, sy, sz = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])
    cx, cy, cz = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    w = cy * cx * cz + sy * sx * sz
    x = cy * sx * cz + sy * cx * sz
    y = sy * cx * cz - cy * sx * sz
    z = cy * cx * sz - sy * sx * cz
    return quat_normalize(jnp.stack([x, y, z, w], axis=-1))


def quat_to_euler_zxy(q: Array) -> Array:
    """Euler extraction matching math.ts:209-231 exactly.

    Note: like the reference, this is only an *approximate* inverse of
    :func:`quat_from_euler_zxy` (exact for small angles); reproduced verbatim
    for behavioral parity.
    """
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rot_x = jnp.arctan2(2.0 * (qw * qx + qy * qz), 1.0 - 2.0 * (qx * qx + qy * qy))
    sinp = 2.0 * (qw * qy - qz * qx)
    rot_y = jnp.where(
        jnp.abs(sinp) >= 1.0,
        jnp.sign(sinp) * (jnp.pi / 2.0),
        jnp.arcsin(jnp.clip(sinp, -1.0, 1.0)),
    )
    rot_z = jnp.arctan2(2.0 * (qw * qz + qx * qy), 1.0 - 2.0 * (qy * qy + qz * qz))
    return jnp.stack([rot_x, rot_y, rot_z], axis=-1)


def quat_from_to(v_from: Array, v_to: Array) -> Array:
    """Quaternion rotating unit vector ``v_from`` onto ``v_to`` (math.ts:135-149)."""
    d = jnp.sum(v_from * v_to, axis=-1, keepdims=True)
    axis = jnp.cross(v_from, v_to)
    w = jnp.sqrt(jnp.maximum((1.0 + d) * 2.0, 1e-12))
    general = jnp.concatenate([axis / w, 0.5 * w], axis=-1)

    # 180-degree fallback: any axis orthogonal to v_from
    alt1 = jnp.cross(v_from, jnp.asarray([1.0, 0.0, 0.0]))
    alt2 = jnp.cross(v_from, jnp.asarray([0.0, 1.0, 0.0]))
    alt = jnp.where(jnp.linalg.norm(alt1, axis=-1, keepdims=True) < 1e-3, alt2, alt1)
    flip = jnp.concatenate([alt, jnp.zeros_like(d)], axis=-1)

    ident = jnp.broadcast_to(jnp.asarray(IDENTITY_QUAT), general.shape)
    out = jnp.where(d > 0.999999, ident, jnp.where(d < -0.999999, flip, general))
    return quat_normalize(out)


# ---------------------------------------------------------------------------
# Matrices
# ---------------------------------------------------------------------------


def mat3_from_quat(q: Array) -> Array:
    """Rotation matrix (..., 3, 3) from quaternion (math.ts:352-384)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    x2, y2, z2 = x + x, y + y, z + z
    xx, xy, xz = x * x2, x * y2, x * z2
    yy, yz, zz = y * y2, y * z2, z * z2
    wx, wy, wz = w * x2, w * y2, w * z2
    row0 = jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1)
    row1 = jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1)
    row2 = jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def mat4_from_quat(q: Array) -> Array:
    r = mat3_from_quat(q)
    return mat4_from_rot_pos(r, jnp.zeros(q.shape[:-1] + (3,), dtype=q.dtype))


def mat4_from_rot_pos(rot3: Array, pos: Array) -> Array:
    """Compose (..., 4, 4) from a 3x3 rotation block and a translation."""
    batch = jnp.broadcast_shapes(rot3.shape[:-2], pos.shape[:-1])
    rot3 = jnp.broadcast_to(rot3, batch + (3, 3))
    pos = jnp.broadcast_to(pos, batch + (3,))
    top = jnp.concatenate([rot3, pos[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0]), batch + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def mat4_from_pos_quat(pos: Array, q: Array) -> Array:
    """math.ts:387-393 (fromPositionRotation)."""
    return mat4_from_rot_pos(mat3_from_quat(q), pos)


def mat4_translation(t: Array) -> Array:
    eye = jnp.broadcast_to(jnp.eye(4), t.shape[:-1] + (4, 4))
    return _set_translation(eye, t)


def _set_translation(eye: Array, t: Array) -> Array:
    return jnp.concatenate(
        [
            jnp.concatenate([eye[..., :3, :3], t[..., :, None]], axis=-1),
            eye[..., 3:4, :],
        ],
        axis=-2,
    )


def mat4_to_quat(m: Array) -> Array:
    """Branchless rotation-matrix -> quaternion (math.ts:406-448 semantics)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    trace = m00 + m11 + m22

    def cand(s_sq, build):
        s = jnp.sqrt(jnp.maximum(s_sq, 1e-12)) * 2.0
        return build(s)

    c0 = cand(trace + 1.0, lambda s: jnp.stack(
        [(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s], axis=-1))
    c1 = cand(1.0 + m00 - m11 - m22, lambda s: jnp.stack(
        [0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s], axis=-1))
    c2 = cand(1.0 + m11 - m00 - m22, lambda s: jnp.stack(
        [(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s], axis=-1))
    c3 = cand(1.0 + m22 - m00 - m11, lambda s: jnp.stack(
        [(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s], axis=-1))

    use0 = (trace > 0.0)[..., None]
    use1 = ((m00 > m11) & (m00 > m22))[..., None]
    use2 = (m11 > m22)[..., None]
    q = jnp.where(use0, c0, jnp.where(use1, c1, jnp.where(use2, c2, c3)))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def mat4_inverse(m: Array) -> Array:
    return jnp.linalg.inv(m)


def mat4_inverse_rigid(m: Array) -> Array:
    """Fast inverse for rigid transforms (rotation + translation only)."""
    r = m[..., :3, :3]
    t = m[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    new_t = -jnp.einsum("...ij,...j->...i", rt, t)
    return mat4_from_rot_pos(rt, new_t)


def transform_point(m: Array, p: Array) -> Array:
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], p) + m[..., :3, 3]


def transform_dir(m: Array, v: Array) -> Array:
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], v)


# ---------------------------------------------------------------------------
# Camera matrices (left-handed, Z+ forward, depth in [0, 1])
# ---------------------------------------------------------------------------


def perspective_lh(fov: Array, aspect: Array, near: Array, far: Array) -> Array:
    """Left-handed perspective, Z in [0(near), 1(far)] (math.ts:247-271).

    The reference stores column-major; transposed here into math layout.
    """
    f = 1.0 / jnp.tan(fov / 2.0)
    range_inv = 1.0 / (far - near)
    z = jnp.zeros_like(f)
    one = jnp.ones_like(f)
    row0 = jnp.stack([f / aspect, z, z, z], axis=-1)
    row1 = jnp.stack([z, f, z, z], axis=-1)
    row2 = jnp.stack([z, z, (far + near) * range_inv, -near * far * range_inv * 2.0], axis=-1)
    row3 = jnp.stack([z, z, one, z], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def look_at_lh(eye: Array, target: Array, up: Array) -> Array:
    """Left-handed lookAt: camera looks along +Z (math.ts:275-301)."""
    def norm(v):
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    forward = norm(target - eye)
    right = norm(jnp.cross(up, forward))
    up_vec = norm(jnp.cross(forward, right))
    rot = jnp.stack([right, up_vec, forward], axis=-2)  # rows
    trans = jnp.stack(
        [
            -jnp.sum(right * eye, axis=-1),
            -jnp.sum(up_vec * eye, axis=-1),
            -jnp.sum(forward * eye, axis=-1),
        ],
        axis=-1,
    )
    return mat4_from_rot_pos(rot, trans)
