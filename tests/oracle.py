"""NumPy oracle: a direct, scalar re-statement of the reference engine's math
(math.ts, model.ts) used to parity-test the vectorized JAX implementation.

Written deliberately in the reference's step order (recursive FK, per-bone
slerp append) so any divergence in the fast path is caught.
"""

from __future__ import annotations

import numpy as np


def ease_in_out(t: float) -> float:
    return 2 * t * t if t < 0.5 else 1 - ((-2 * t + 2) ** 2) / 2


def quat_mul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ]
    )


def quat_slerp(a, b, t):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64).copy()
    cos = float(np.dot(a, b))
    if cos < 0:
        cos = -cos
        b = -b
    if cos > 0.9995:
        out = a + t * (b - a)
        return out / np.linalg.norm(out)
    theta0 = np.arccos(min(cos, 1.0))
    s0 = np.sin(theta0 * (1 - t)) / np.sin(theta0)
    s1 = np.sin(theta0 * t) / np.sin(theta0)
    return s0 * a + s1 * b


def quat_from_euler_zxy(rx, ry, rz):
    cx, sx = np.cos(rx / 2), np.sin(rx / 2)
    cy, sy = np.cos(ry / 2), np.sin(ry / 2)
    cz, sz = np.cos(rz / 2), np.sin(rz / 2)
    w = cy * cx * cz + sy * sx * sz
    x = cy * sx * cz + sy * cx * sz
    y = sy * cx * cz - cy * sx * sz
    z = cy * cx * sz - sy * sx * cz
    q = np.array([x, y, z, w])
    return q / np.linalg.norm(q)


def mat_from_quat(q):
    x, y, z, w = q
    x2, y2, z2 = 2 * x, 2 * y, 2 * z
    xx, xy, xz = x * x2, x * y2, x * z2
    yy, yz, zz = y * y2, y * z2, z * z2
    wx, wy, wz = w * x2, w * y2, w * z2
    m = np.eye(4)
    m[:3, :3] = [
        [1 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1 - (xx + yy)],
    ]
    return m


def translation(t):
    m = np.eye(4)
    m[:3, 3] = t
    return m


def compute_world_matrices(
    parents: np.ndarray,
    bind_trans: np.ndarray,
    local_rot: np.ndarray,
    local_trans: np.ndarray,
    append_parent: np.ndarray,
    append_ratio: np.ndarray,
    append_rotate: np.ndarray,
    append_move: np.ndarray,
) -> np.ndarray:
    """Reference FK semantics (model.ts:330-420), recursion and all.

    Returns (J, 4, 4) world matrices. ``local_trans`` plays the role of the
    reference's localTranslations buffer (zero in the reference's own use).
    """
    n = len(parents)
    world = np.zeros((n, 4, 4))
    computed = np.zeros(n, bool)

    def compute(i):
        if computed[i]:
            return
        rot_m = mat_from_quat(local_rot[i])
        add = np.zeros(3)
        ap = append_parent[i]
        if append_rotate[i] and 0 <= ap < n:
            ratio = float(np.clip(append_ratio[i], -1, 1))
            if abs(ratio) > 1e-6:
                aq = local_rot[ap].copy()
                if ratio < 0:
                    aq[:3] = -aq[:3]
                res = quat_slerp(np.array([0.0, 0.0, 0.0, 1.0]), aq, abs(ratio))
                rot_m = mat_from_quat(res) @ rot_m
        if append_move[i] and 0 <= ap < n and abs(np.clip(append_ratio[i], -1, 1)) > 1e-6:
            add = local_trans[ap] * append_ratio[i]
        local = translation(bind_trans[i] + local_trans[i]) @ rot_m @ translation(add)
        p = parents[i]
        if p >= 0:
            compute(p)
            world[i] = world[p] @ local
        else:
            world[i] = local
        computed[i] = True

    for i in range(n):
        compute(i)
    return world
