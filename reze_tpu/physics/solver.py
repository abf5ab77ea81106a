"""Fixed-timestep rigid-body physics: MMD hair/skirt dynamics on TPU.

Replaces Bullet-via-WASM (physics.ts:53-752) with a jit-compiled solver over
``(NB,)`` body arrays. Reference semantics kept exactly:

* step cadence: ``stepSimulation(dt, maxSubSteps=10, fixed=1/75)``
  (physics.ts:705-712) — a time accumulator runs up to 10 fixed substeps.
* first-frame init: bodies positioned from current bone pose with zero
  velocities before constraints act (physics.ts:542-561).
* per-frame sync: kinematic/static bodies follow bones with zeroed
  velocities (physics.ts:649-702); dynamic bodies write their transform back
  into bone world transforms (physics.ts:715-751) with the same
  NaN/magnitude guard.
* collision filtering: ``(1 << groupA) & maskB`` both ways, no-contact flags
  for mask==0 / zero-volume shapes (physics.ts:257-267).
* damping: Bullet's ``v *= (1 - damping)^h``.

The constraint solver itself is **XPBD** (substep position-based dynamics,
Mueller et al.) rather than Bullet's sequential impulse: 6-DOF joints become
positional/angular constraints whose per-axis rule mirrors the reference
setup (physics.ts:383-431): min==max -> hard lock, else limit range; linear
springs only when stiffness != 0, angular springs always, with compliance
1/(k*h^2); constraint ordering uses a greedy graph coloring computed at load
so same-color joints solve in parallel (Gauss-Seidel quality, TPU-parallel
execution). Contacts (sphere/capsule/box combinations) solve Jacobi with
under-relaxation. Parity with Bullet is tolerance-based, matching the survey
plan (SURVEY.md section 7.3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math3d as m3
from ..core.types import EngineConfig, PhysicsModel, PhysicsState

Array = jax.Array

_CONTACT_RELAX = 0.6  # Jacobi under-relaxation for contacts
_MAX_COLORS = 16


# ---------------------------------------------------------------------------
# Build-time helpers (host)
# ---------------------------------------------------------------------------


def color_joints(pm: PhysicsModel) -> np.ndarray:
    """Greedy graph coloring: joints sharing a *dynamic* body get different
    colors so each color class solves Gauss-Seidel-exactly in parallel."""
    nj = pm.joint_body_a.shape[0]
    a = np.asarray(pm.joint_body_a)
    b = np.asarray(pm.joint_body_b)
    valid = np.asarray(pm.joint_valid)
    dyn = np.asarray(pm.is_dynamic)
    colors = np.zeros(nj, np.int32)
    used_by_body: dict[int, set[int]] = {}
    for j in range(nj):
        if not valid[j]:
            continue
        taken = set()
        for body in (a[j], b[j]):
            if body >= 0 and dyn[body]:
                taken |= used_by_body.get(int(body), set())
        c = 0
        while c in taken and c < _MAX_COLORS - 1:
            c += 1
        colors[j] = c
        for body in (a[j], b[j]):
            if body >= 0 and dyn[body]:
                used_by_body.setdefault(int(body), set()).add(c)
    return colors


def build_pairs(pm: PhysicsModel) -> tuple[np.ndarray, np.ndarray]:
    """Static candidate collision pairs (i, j) honoring group masks,
    no-contact flags, and at-least-one-dynamic."""
    nb = pm.bone_index.shape[0]
    group = np.asarray(pm.group)
    mask = np.asarray(pm.collision_mask)
    valid = np.asarray(pm.valid)
    dyn = np.asarray(pm.is_dynamic)
    noc = np.asarray(pm.no_contact)
    pairs = []
    for i in range(nb):
        if not valid[i] or noc[i]:
            continue
        for j in range(i + 1, nb):
            if not valid[j] or noc[j]:
                continue
            if not (dyn[i] or dyn[j]):
                continue
            if not ((1 << group[i]) & mask[j]) or not ((1 << group[j]) & mask[i]):
                continue
            pairs.append((i, j))
    if not pairs:
        pairs = [(0, 0)]
    arr = np.asarray(pairs, np.int32)
    return arr[:, 0], arr[:, 1]


class SolverTables(NamedTuple):
    """Host-precomputed static solver data.

    Joints are permuted so each color class is a contiguous slice
    (``joint_perm``; slice c = ``[color_starts[c], color_starts[c+1])``) —
    the per-color Gauss-Seidel sweep then runs on exactly its own joints
    instead of a masked pass over all of them. ``has_lin_spring`` /
    ``has_ang_spring`` statically skip spring sub-solves for models with no
    spring stiffness anywhere (common: MMD exports drive hair purely with
    limits).
    """

    joint_perm: np.ndarray  # (NJ,) permutation, color-contiguous
    color_starts: tuple  # (n_colors + 1,) python ints
    pair_i: Array  # (P,)
    pair_j: Array  # (P,)
    n_active: int  # static active-contact budget per substep
    has_lin_spring: bool
    has_ang_spring: bool


_TABLE_CACHE: dict[tuple, SolverTables] = {}


def _tables_key(pm: PhysicsModel, max_contacts: int) -> tuple:
    """Content hash over every array that color_joints / build_pairs /
    the spring flags read — id()-keyed caching could return stale tables
    after the original arrays were garbage-collected (advisor r3)."""
    import hashlib

    h = hashlib.sha1()
    for a in (pm.joint_body_a, pm.joint_body_b, pm.joint_valid,
              pm.joint_spring_lin, pm.joint_spring_ang, pm.is_dynamic,
              pm.group, pm.collision_mask, pm.valid, pm.no_contact):
        arr = np.ascontiguousarray(np.asarray(a))
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    return (h.hexdigest(), max_contacts)


def get_tables(pm: PhysicsModel, max_contacts: int = 512) -> SolverTables:
    key = _tables_key(pm, max_contacts)
    if key not in _TABLE_CACHE:
        colors = color_joints(pm)
        valid = np.asarray(pm.joint_valid)
        # invalid joints go into a final, never-solved bucket
        sort_key = np.where(valid, colors, _MAX_COLORS)
        perm = np.argsort(sort_key, kind="stable")
        sorted_key = sort_key[perm]
        n_colors = int(colors[valid].max()) + 1 if valid.any() else 0
        starts = tuple(
            int(np.searchsorted(sorted_key, c)) for c in range(n_colors + 1)
        )
        pi, pj = build_pairs(pm)
        # keep plain NumPy: these become fresh constants in every trace (jnp
        # arrays created inside one trace would leak into the next)
        _TABLE_CACHE[key] = SolverTables(
            joint_perm=perm.astype(np.int32),
            color_starts=starts,
            pair_i=pi,
            pair_j=pj,
            n_active=min(max_contacts, pi.shape[0]),
            has_lin_spring=bool((np.asarray(pm.joint_spring_lin)[valid] > 0).any()),
            has_ang_spring=bool((np.asarray(pm.joint_spring_ang)[valid] > 0).any()),
        )
    return _TABLE_CACHE[key]


class JointSlice(NamedTuple):
    """Per-color contiguous joint data (gathered once per step)."""

    a: Array
    b: Array
    pos_a: Array
    quat_a: Array
    pos_b: Array
    quat_b: Array
    lin_min: Array
    lin_max: Array
    ang_min: Array
    ang_max: Array
    spring_lin: Array
    spring_ang: Array


# ---------------------------------------------------------------------------
# Geometry: closest points between shapes
# ---------------------------------------------------------------------------


def _shape_segment(pm: PhysicsModel, pos: Array, quat: Array) -> tuple[Array, Array, Array]:
    """Represent each body as a capsule segment + radius.

    sphere: zero-length segment, r = size.x
    capsule (Y axis): half-height size.y/2, r = size.x
    box: approximated as a segment along its longest axis with the
    second-longest half-extent as radius (contact-only approximation).
    """
    size = pm.size
    shape = pm.shape
    axis_y = m3.quat_rotate(quat, jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), pos.shape))

    # capsule
    cap_half = size[:, 1:2] * 0.5
    cap_r = size[:, 0]

    # box: longest axis
    ax_id = jnp.argmax(size, axis=1)
    basis = jnp.eye(3)
    long_axis_local = basis[ax_id]
    long_axis = m3.quat_rotate(quat, long_axis_local)
    sorted_sz = jnp.sort(size, axis=1)
    box_half = (sorted_sz[:, 2:3] - sorted_sz[:, 1:2]) .clip(0.0)
    box_r = sorted_sz[:, 1] * 1.0

    half_vec = jnp.where(
        (shape == 2)[:, None], axis_y * cap_half,
        jnp.where((shape == 1)[:, None], long_axis * box_half, 0.0),
    )
    radius = jnp.where(shape == 2, cap_r, jnp.where(shape == 1, box_r, size[:, 0]))
    return pos - half_vec, pos + half_vec, radius


def _closest_segment_segment(p1, q1, p2, q2):
    """Closest points between segments [p1,q1] and [p2,q2] (batched)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.sum(d1 * d1, -1)
    e = jnp.sum(d2 * d2, -1)
    f = jnp.sum(d2 * r, -1)
    c = jnp.sum(d1 * r, -1)
    b = jnp.sum(d1 * d2, -1)
    denom = a * e - b * b
    s = jnp.where(denom > 1e-12, jnp.clip((b * f - c * e) / jnp.maximum(denom, 1e-12), 0, 1), 0.0)
    t = jnp.where(e > 1e-12, jnp.clip((b * s + f) / jnp.maximum(e, 1e-12), 0, 1), 0.0)
    # re-clamp s for the clamped t
    s = jnp.where(a > 1e-12, jnp.clip((b * t - c) / jnp.maximum(a, 1e-12), 0, 1), 0.0)
    c1 = p1 + d1 * s[..., None]
    c2 = p2 + d2 * t[..., None]
    return c1, c2


# ---------------------------------------------------------------------------
# XPBD core
# ---------------------------------------------------------------------------


def _apply_pos_correction(pos, quat, inv_mass, inv_inertia_w, body, corr, point):
    """Apply positional impulse `corr` at world `point` to a body (gathered
    indices). Returns (dpos, drot_vec) contributions."""
    dp = corr * inv_mass[body][:, None]
    r = point - pos[body]
    torque = jnp.cross(r, corr)
    dw = jnp.einsum("bij,bj->bi", inv_inertia_w[body], torque)
    return dp, dw


def _inv_inertia_world(pm: PhysicsModel, quat: Array) -> Array:
    r = m3.mat3_from_quat(quat)  # (NB, 3, 3)
    # kinematic/static bodies must not respond to angular impulses: an
    # unmasked inverse inertia let joint corrections ROTATE the static
    # anchor a hair chain hangs from (the chain then pivots around its
    # root — r4 hair-oracle divergence root cause). Bullet zeroes the
    # inverse inertia tensor of non-dynamic bodies the same way.
    inv_i = jnp.where((pm.is_dynamic & pm.valid)[:, None],
                      pm.inv_inertia_local, 0.0)
    return jnp.einsum("bij,bj,bkj->bik", r, inv_i, r)


def _quat_add_rot(quat: Array, dw: Array) -> Array:
    """q += 0.5 * [dw, 0] * q, renormalized."""
    dq = m3.quat_mul(jnp.concatenate([dw, jnp.zeros_like(dw[..., :1])], -1), quat)
    return m3.quat_normalize(quat + 0.5 * dq)


def _joint_violations(js: JointSlice, pos: Array, quat: Array
                      ) -> tuple[Array, Array]:
    """Raw limit/lock violations of one joint slice at the given state:
    (lin (NJ, 3) in frame-A axes, ang (NJ, 3) ZXY euler beyond [min, max]).
    Used once per substep to build the stop-ERP slack (Bullet corrects only
    BT_CONSTRAINT_STOP_ERP = 0.475 of a limit violation per step,
    physics.ts:383-385; solving to zero would make hair stiffer than the
    reference)."""
    pos_a, quat_a = pos[jnp.maximum(js.a, 0)], quat[jnp.maximum(js.a, 0)]
    pos_b, quat_b = pos[jnp.maximum(js.b, 0)], quat[jnp.maximum(js.b, 0)]
    pa = pos_a + m3.quat_rotate(quat_a, js.pos_a)
    pb = pos_b + m3.quat_rotate(quat_b, js.pos_b)
    qa = m3.quat_mul(quat_a, js.quat_a)
    qb = m3.quat_mul(quat_b, js.quat_b)
    axes = jnp.swapaxes(m3.mat3_from_quat(qa), -1, -2)
    d_axes = jnp.einsum("bkw,bw->bk", axes, pb - pa)
    lin = jnp.where(d_axes < js.lin_min, d_axes - js.lin_min,
                    jnp.where(d_axes > js.lin_max, d_axes - js.lin_max, 0.0))
    e = m3.quat_to_euler_zxy(m3.quat_mul(m3.quat_conj(qa), qb))
    ang = jnp.where(e < js.ang_min, e - js.ang_min,
                    jnp.where(e > js.ang_max, e - js.ang_max, 0.0))
    return lin, ang


def _apply_slack(viol: Array, slack: Array) -> Array:
    """Shrink a violation toward zero by the substep's stop-ERP slack,
    never crossing zero (once the target is reached, no further pull)."""
    adj = viol - slack
    return jnp.where(adj * jnp.sign(viol) > 0.0, adj, 0.0)


def _solve_joints_slice(
    js: JointSlice,
    h: Array,
    pos: Array,
    quat: Array,
    inv_mass: Array,
    inv_inertia_w: Array,
    has_lin_spring: bool,
    has_ang_spring: bool,
    slack: tuple[Array, Array] | None = None,
) -> tuple[Array, Array]:
    """Solve one color class of joints (contiguous slice) in parallel.

    Within a color every dynamic body appears in at most one joint, so the
    scatter-adds are collision-free — this is exact Gauss-Seidel at vector
    throughput. ``inv_inertia_w`` is the iteration-start world-space inverse
    inertia (lagged within the iteration; standard XPBD practice).
    """
    a = jnp.maximum(js.a, 0)
    b = jnp.maximum(js.b, 0)

    # ONE packed row gather per side instead of 4 separate gathers (gather
    # cost is per-index — docs/DESIGN.md round 3): [pos | quat | w | ii]
    state_tab = jnp.concatenate(
        [pos, quat, inv_mass[:, None],
         inv_inertia_w.reshape(pos.shape[0], 9)], axis=1)  # (N, 17)
    row_a = state_tab[a]
    row_b = state_tab[b]
    pos_a, quat_a = row_a[:, 0:3], row_a[:, 3:7]
    pos_b, quat_b = row_b[:, 0:3], row_b[:, 3:7]
    wa, wb = row_a[:, 7], row_b[:, 7]
    ii_a = row_a[:, 8:17].reshape(-1, 3, 3)
    ii_b = row_b[:, 8:17].reshape(-1, 3, 3)

    # world joint frames
    pa = pos_a + m3.quat_rotate(quat_a, js.pos_a)
    pb = pos_b + m3.quat_rotate(quat_b, js.pos_b)
    qa = m3.quat_mul(quat_a, js.quat_a)
    qb = m3.quat_mul(quat_b, js.quat_b)

    dpos = jnp.zeros_like(pos)
    dq_acc = jnp.zeros_like(pos)  # rotation vectors

    # ---- linear: constrain d (in frame A basis) into [min, max], plus
    # spring toward 0 when stiffness != 0
    frame_a_rot = m3.mat3_from_quat(qa)  # column k = world direction of axis k
    d_world = pb - pa
    axes = jnp.swapaxes(frame_a_rot, -1, -2)  # (NJ, 3axes, 3world)
    d_axes = jnp.einsum("bkw,bw->bk", axes, d_world)

    lo = js.lin_min
    hi = js.lin_max
    # hard violation outside [lo, hi]
    viol = jnp.where(d_axes < lo, d_axes - lo, jnp.where(d_axes > hi, d_axes - hi, 0.0))
    if slack is not None:
        viol = _apply_slack(viol, slack[0])
    lin_solves = [(viol, None)]
    if has_lin_spring:
        # spring toward 0 with compliance 1/(k h^2)
        k_lin = js.spring_lin
        alpha = jnp.where(k_lin > 0, 1.0 / jnp.maximum(k_lin, 1e-6), 0.0) / jnp.maximum(h * h, 1e-12)
        lin_solves.append((jnp.where(k_lin > 0, d_axes, 0.0), alpha))

    # every sub-solve below computes its correction from the SAME
    # slice-start state (pa/pb/ra/rb/ii are not refreshed within the
    # slice), so the per-joint impulses accumulate in (NJ, 3) locals and
    # scatter ONCE per side at the end — 24 scatter-adds -> 4 (scatter ops
    # carry fixed overhead on TPU; this slice runs 10 colors x 10
    # iterations per substep)
    imp_b = jnp.zeros_like(pa)
    imp_a = jnp.zeros_like(pa)
    tq_b = jnp.zeros_like(pa)
    tq_a = jnp.zeros_like(pa)

    ra = pa - pos_a
    rb = pb - pos_b
    for axis_k in range(3):
        n = axes[:, axis_k]  # (NJ, 3)
        for c_all, compliance in lin_solves:
            c_val = c_all[:, axis_k]
            comp = jnp.zeros_like(c_val) if compliance is None else compliance[:, axis_k]
            ra_x_n = jnp.cross(ra, n)
            rb_x_n = jnp.cross(rb, n)
            w_sum = (
                wa + wb
                + jnp.einsum("bi,bij,bj->b", ra_x_n, ii_a, ra_x_n)
                + jnp.einsum("bi,bij,bj->b", rb_x_n, ii_b, rb_x_n)
            )
            dlam = -c_val / jnp.maximum(w_sum + comp, 1e-9)
            dlam = jnp.where(w_sum > 0, dlam, 0.0)
            p_imp = n * dlam[:, None]
            # B moves +, A moves - (c = d·n, d = pb - pa)
            imp_b = imp_b + p_imp * wb[:, None]
            imp_a = imp_a - p_imp * wa[:, None]
            tq_b = tq_b + jnp.einsum("bij,bj->bi", ii_b, jnp.cross(rb, p_imp))
            tq_a = tq_a - jnp.einsum("bij,bj->bi", ii_a, jnp.cross(ra, p_imp))

    # ---- angular: relative rotation euler (ZXY) per-axis limits + springs
    q_rel = m3.quat_mul(m3.quat_conj(qa), qb)
    e = m3.quat_to_euler_zxy(q_rel)  # (NJ, 3)
    aviol = jnp.where(e < js.ang_min, e - js.ang_min,
                      jnp.where(e > js.ang_max, e - js.ang_max, 0.0))
    if slack is not None:
        aviol = _apply_slack(aviol, slack[1])
    ang_solves = [(aviol, None)]
    if has_ang_spring:
        k_ang = js.spring_ang
        a_alpha = jnp.where(k_ang > 0, 1.0 / jnp.maximum(k_ang, 1e-6), 0.0) / jnp.maximum(h * h, 1e-12)
        ang_solves.append((jnp.where(k_ang > 0, e, 0.0), a_alpha))

    for axis_k in range(3):
        n = axes[:, axis_k]
        for c_all, compliance in ang_solves:
            c_val = c_all[:, axis_k]
            comp = jnp.zeros_like(c_val) if compliance is None else compliance[:, axis_k]
            w_sum = (
                jnp.einsum("bi,bij,bj->b", n, ii_a, n)
                + jnp.einsum("bi,bij,bj->b", n, ii_b, n)
            )
            dlam = -c_val / jnp.maximum(w_sum + comp, 1e-9)
            dlam = jnp.where(w_sum > 0, dlam, 0.0)
            t_imp = n * dlam[:, None]
            tq_b = tq_b + jnp.einsum("bij,bj->bi", ii_b, t_imp)
            tq_a = tq_a - jnp.einsum("bij,bj->bi", ii_a, t_imp)

    # the four deferred scatters (within a color each body appears in at
    # most one joint, so index sets are duplicate-free)
    dpos = dpos.at[b].add(imp_b).at[a].add(imp_a)
    dq_acc = dq_acc.at[b].add(tq_b).at[a].add(tq_a)

    pos = pos + dpos
    quat = _quat_add_rot(quat, dq_acc)
    return pos, quat


def _joint_velocity_slice(
    js: JointSlice,
    vel: Array,
    ang: Array,
    pos: Array,
    quat: Array,
    inv_mass: Array,
    inv_inertia_w: Array,
) -> tuple[Array, Array]:
    """Bullet's constraint-row velocity solve for one color slice: zero the
    RELATIVE VELOCITY along every locked or limit-violating joint axis.

    btSequentialImpulseConstraintSolver solves rows at the velocity level —
    the impulse both stops relative motion AND adds the stop-ERP bias; only
    the bias is erp-scaled. The XPBD position solve with stop-ERP slack
    (_apply_slack) reproduces the positional 47.5%%/step correction but
    leaves the residual motion in the reconstructed velocities, so joints
    ring like undamped springs where Bullet's come to rest. This pass adds
    the missing "stop": after the velocity reconstruction, project out
    joint-space relative velocity (full for locked axes, one-sided into the
    violation for limits). Springs are untouched (they are forces, not
    stops). Reference rows: physics.ts:383-431.
    """
    a = jnp.maximum(js.a, 0)
    b = jnp.maximum(js.b, 0)
    state_tab = jnp.concatenate(
        [pos, quat, inv_mass[:, None],
         inv_inertia_w.reshape(pos.shape[0], 9), vel, ang], axis=1)  # (N, 23)
    row_a = state_tab[a]
    row_b = state_tab[b]
    pos_a, quat_a = row_a[:, 0:3], row_a[:, 3:7]
    pos_b, quat_b = row_b[:, 0:3], row_b[:, 3:7]
    wa, wb = row_a[:, 7], row_b[:, 7]
    ii_a = row_a[:, 8:17].reshape(-1, 3, 3)
    ii_b = row_b[:, 8:17].reshape(-1, 3, 3)
    va, vb = row_a[:, 17:20], row_b[:, 17:20]
    oa, ob = row_a[:, 20:23], row_b[:, 20:23]

    pa = pos_a + m3.quat_rotate(quat_a, js.pos_a)
    pb = pos_b + m3.quat_rotate(quat_b, js.pos_b)
    qa = m3.quat_mul(quat_a, js.quat_a)
    qb = m3.quat_mul(quat_b, js.quat_b)
    frame_a_rot = m3.mat3_from_quat(qa)
    axes = jnp.swapaxes(frame_a_rot, -1, -2)  # (NJ, 3axes, 3world)
    d_axes = jnp.einsum("bkw,bw->bk", axes, pb - pa)

    ra = pa - pos_a
    rb = pb - pos_b
    u_lin = (vb + jnp.cross(ob, rb)) - (va + jnp.cross(oa, ra))  # (NJ, 3)

    dv = jnp.zeros_like(pos)
    dw = jnp.zeros_like(pos)
    imp_b = jnp.zeros_like(pa)
    imp_a = jnp.zeros_like(pa)
    tq_b = jnp.zeros_like(pa)
    tq_a = jnp.zeros_like(pa)

    eps = 1e-6
    for axis_k in range(3):
        n = axes[:, axis_k]
        un = jnp.einsum("bw,bw->b", n, u_lin)
        lo = js.lin_min[:, axis_k]
        hi = js.lin_max[:, axis_k]
        locked = (hi - lo) < eps
        # one-sided for limits: stop only motion deeper into the violation
        active = locked | ((d_axes[:, axis_k] >= hi) & (un > 0.0)) \
            | ((d_axes[:, axis_k] <= lo) & (un < 0.0))
        ra_x_n = jnp.cross(ra, n)
        rb_x_n = jnp.cross(rb, n)
        w_sum = (
            wa + wb
            + jnp.einsum("bi,bij,bj->b", ra_x_n, ii_a, ra_x_n)
            + jnp.einsum("bi,bij,bj->b", rb_x_n, ii_b, rb_x_n)
        )
        dlam = jnp.where(active & (w_sum > 0), -un / jnp.maximum(w_sum, 1e-9),
                         0.0)
        p_imp = n * dlam[:, None]
        imp_b = imp_b + p_imp * wb[:, None]
        imp_a = imp_a - p_imp * wa[:, None]
        tq_b = tq_b + jnp.einsum("bij,bj->bi", ii_b, jnp.cross(rb, p_imp))
        tq_a = tq_a - jnp.einsum("bij,bj->bi", ii_a, jnp.cross(ra, p_imp))

    q_rel = m3.quat_mul(m3.quat_conj(qa), qb)
    e = m3.quat_to_euler_zxy(q_rel)
    w_rel = ob - oa
    for axis_k in range(3):
        n = axes[:, axis_k]
        un = jnp.einsum("bw,bw->b", n, w_rel)
        lo = js.ang_min[:, axis_k]
        hi = js.ang_max[:, axis_k]
        locked = (hi - lo) < eps
        active = locked | ((e[:, axis_k] >= hi) & (un > 0.0)) \
            | ((e[:, axis_k] <= lo) & (un < 0.0))
        w_sum = (
            jnp.einsum("bi,bij,bj->b", n, ii_a, n)
            + jnp.einsum("bi,bij,bj->b", n, ii_b, n)
        )
        dlam = jnp.where(active & (w_sum > 0), -un / jnp.maximum(w_sum, 1e-9),
                         0.0)
        t_imp = n * dlam[:, None]
        tq_b = tq_b + jnp.einsum("bij,bj->bi", ii_b, t_imp)
        tq_a = tq_a - jnp.einsum("bij,bj->bi", ii_a, t_imp)

    dv = dv.at[b].add(imp_b).at[a].add(imp_a)
    dw = dw.at[b].add(tq_b).at[a].add(tq_a)
    return vel + dv, ang + dw


def _select_active_contacts(
    pm: PhysicsModel, tables: SolverTables, pos: Array, quat: Array
) -> tuple[Array, Array, Array]:
    """Once-per-substep broadphase: narrow-phase all candidate pairs and keep
    the n_active closest-to-penetration (Bullet builds its manifold once per
    step too). Iterations then re-solve only this static-size active set.

    Also returns the number of PENETRATING pairs dropped by the top-k cap —
    nonzero means the solver ignored real contacts this substep (surfaced in
    Engine.get_stats as contact_overflow)."""
    i = tables.pair_i
    j = tables.pair_j
    a0, a1, ra = _shape_segment(pm, pos, quat)
    # one packed row gather per side (gather cost is per-index)
    seg = jnp.concatenate([a0, a1, ra[:, None]], axis=1)  # (N, 7)
    si = seg[i]
    sj = seg[j]
    c1, c2 = _closest_segment_segment(si[:, 0:3], si[:, 3:6],
                                      sj[:, 0:3], sj[:, 3:6])
    dist = jnp.linalg.norm(c2 - c1, axis=-1)
    score = (si[:, 6] + sj[:, 6]) - dist  # signed penetration
    _, top = jax.lax.top_k(score, tables.n_active)
    n_pen = jnp.sum(score > 0.0).astype(jnp.int32)
    dropped = jnp.maximum(n_pen - tables.n_active, 0)
    return jnp.asarray(i)[top], jnp.asarray(j)[top], dropped


def _solve_contacts(
    pm: PhysicsModel,
    i: Array,
    j: Array,
    pos: Array,
    quat: Array,
    inv_mass: Array,
    inv_inertia_w: Array,
) -> tuple[Array, Array]:
    """One Jacobi iteration of non-penetration contacts (under-relaxed)
    over the substep's active pair set."""
    a0, a1, ra = _shape_segment(pm, pos, quat)
    # ONE packed row gather per side instead of 6 (per-index gather cost):
    # [a0 | a1 | r | pos | w | ii]
    seg_tab = jnp.concatenate(
        [a0, a1, ra[:, None], pos, inv_mass[:, None],
         inv_inertia_w.reshape(pos.shape[0], 9)], axis=1)  # (N, 20)
    row_i = seg_tab[i]
    row_j = seg_tab[j]
    c1, c2 = _closest_segment_segment(
        row_i[:, 0:3], row_i[:, 3:6], row_j[:, 0:3], row_j[:, 3:6])
    r_i, r_j = row_i[:, 6], row_j[:, 6]
    pos_i, pos_j = row_i[:, 7:10], row_j[:, 7:10]
    wi, wj = row_i[:, 10], row_j[:, 10]
    ii_i = row_i[:, 11:20].reshape(-1, 3, 3)
    ii_j = row_j[:, 11:20].reshape(-1, 3, 3)
    delta = c2 - c1
    dist = jnp.linalg.norm(delta, axis=-1)
    rsum = r_i + r_j
    pen = rsum - dist  # > 0 means penetration
    n = delta / jnp.maximum(dist, 1e-8)[:, None]
    active = pen > 0.0

    pi_ = c1 + n * r_i[:, None]
    pj_ = c2 - n * r_j[:, None]
    ri = pi_ - pos_i
    rj = pj_ - pos_j
    ri_x_n = jnp.cross(ri, n)
    rj_x_n = jnp.cross(rj, n)
    w_sum = (
        wi + wj
        + jnp.einsum("bi,bij,bj->b", ri_x_n, ii_i, ri_x_n)
        + jnp.einsum("bi,bij,bj->b", rj_x_n, ii_j, rj_x_n)
    )
    dlam = jnp.where(active & (w_sum > 0), pen / jnp.maximum(w_sum, 1e-9), 0.0)
    dlam = dlam * _CONTACT_RELAX
    imp = -n * dlam[:, None]  # push i along -n, j along +n

    dpos = jnp.zeros_like(pos)
    dpos = dpos.at[i].add(imp * wi[:, None])
    dpos = dpos.at[j].add(-imp * wj[:, None])
    drot = jnp.zeros_like(pos)
    drot = drot.at[i].add(jnp.einsum("bij,bj->bi", ii_i, jnp.cross(ri, imp)))
    drot = drot.at[j].add(-jnp.einsum("bij,bj->bi", ii_j, jnp.cross(rj, imp)))
    return pos + dpos, _quat_add_rot(quat, drot)


def _contact_velocity_pass(
    pm: PhysicsModel,
    i: Array,
    j: Array,
    pos: Array,
    quat: Array,
    lin_vel: Array,
    ang_vel: Array,
    pre_lin: Array,
    pre_ang: Array,
    inv_mass: Array,
    inv_inertia_w: Array,
    h: Array,
    g_mag: Array,
) -> tuple[Array, Array]:
    """XPBD velocity pass: Coulomb friction + restitution at active contacts.

    The reference sets both per body from PMX data (physics.ts:242-243);
    Bullet combines them multiplicatively across a pair. Friction clamps the
    tangential velocity change to mu * J_n where the normal impulse J_n is
    estimated from this substep's positional correction (lambda_n / h);
    restitution reflects the pre-solve approach velocity when it exceeds a
    small resting threshold (2*g*h) to avoid jitter on resting contacts.
    """
    a0, a1, ra = _shape_segment(pm, pos, quat)
    c1, c2 = _closest_segment_segment(a0[i], a1[i], a0[j], a1[j])
    delta = c2 - c1
    dist = jnp.linalg.norm(delta, axis=-1)
    pen = ra[i] + ra[j] - dist
    n = delta / jnp.maximum(dist, 1e-8)[:, None]
    active = pen > 0.0

    wi = inv_mass[i]
    wj = inv_mass[j]
    pi_ = c1 + n * ra[i][:, None]
    pj_ = c2 - n * ra[j][:, None]
    ri = pi_ - pos[i]
    rj = pj_ - pos[j]

    def w_along(dirv):
        ri_x = jnp.cross(ri, dirv)
        rj_x = jnp.cross(rj, dirv)
        return (
            wi + wj
            + jnp.einsum("bi,bij,bj->b", ri_x, inv_inertia_w[i], ri_x)
            + jnp.einsum("bi,bij,bj->b", rj_x, inv_inertia_w[j], rj_x)
        )

    def apply(dlin, dang, dirv, dlam):
        """Impulse dirv*dlam on j, -dirv*dlam on i (dlam in impulse units)."""
        imp = dirv * dlam[:, None]
        dlin = dlin.at[j].add(imp * wj[:, None])
        dlin = dlin.at[i].add(-imp * wi[:, None])
        dang = dang.at[j].add(
            jnp.einsum("bij,bj->bi", inv_inertia_w[j], jnp.cross(rj, imp))
        )
        dang = dang.at[i].add(
            -jnp.einsum("bij,bj->bi", inv_inertia_w[i], jnp.cross(ri, imp))
        )
        return dlin, dang

    # relative velocity of j w.r.t. i at the contact (n points i -> j, so
    # v_n > 0 is separating)
    v_rel = (lin_vel[j] + jnp.cross(ang_vel[j], rj)) - (
        lin_vel[i] + jnp.cross(ang_vel[i], ri)
    )
    v_n = jnp.sum(v_rel * n, axis=-1)
    v_t = v_rel - n * v_n[:, None]
    vt_mag = jnp.linalg.norm(v_t, axis=-1)
    t_hat = v_t / jnp.maximum(vt_mag, 1e-9)[:, None]

    dlin = jnp.zeros_like(lin_vel)
    dang = jnp.zeros_like(ang_vel)

    # ---- friction: |dv_t| <= mu * lambda_n / h  (lambda_n from the position
    # solve, approximated by this substep's penetration correction)
    w_n = w_along(n)
    w_t = w_along(t_hat)
    lam_n = jnp.where(active & (w_n > 0), pen * _CONTACT_RELAX / jnp.maximum(w_n, 1e-9), 0.0)
    mu = pm.friction[i] * pm.friction[j]  # Bullet: combined multiplicatively
    dv_cap = mu * lam_n / jnp.maximum(h, 1e-9) * w_t
    dv_t = jnp.minimum(vt_mag, dv_cap)
    ok_t = active & (w_t > 0) & (vt_mag > 1e-9)
    dlam_t = jnp.where(ok_t, dv_t / jnp.maximum(w_t, 1e-9), 0.0)
    dlin, dang = apply(dlin, dang, -t_hat, dlam_t)

    # ---- restitution: reflect pre-solve approach velocity
    v_rel0 = (pre_lin[j] + jnp.cross(pre_ang[j], rj)) - (
        pre_lin[i] + jnp.cross(pre_ang[i], ri)
    )
    v_n0 = jnp.sum(v_rel0 * n, axis=-1)
    e = pm.restitution[i] * pm.restitution[j]
    # resting threshold (standard XPBD practice): 2|g|h from the CONFIGURED
    # gravity so non-default gravity keeps a matched jitter threshold
    thr = 2.0 * g_mag * h
    want = jnp.where(v_n0 < -thr, -e * v_n0, 0.0)
    dv_n = jnp.maximum(want - v_n, 0.0)
    ok_n = active & (w_n > 0) & (e > 0.0)
    dlam_n = jnp.where(ok_n, dv_n / jnp.maximum(w_n, 1e-9), 0.0)
    dlin, dang = apply(dlin, dang, n, dlam_n)

    return lin_vel + dlin, ang_vel + dang


# ---------------------------------------------------------------------------
# Full step
# ---------------------------------------------------------------------------


def bodies_from_bones(pm: PhysicsModel, wq: Array, wp: Array) -> tuple[Array, Array]:
    """Body world pose from bone world pose: body = bone x offset
    (physics.ts:599-645)."""
    bi = jnp.maximum(pm.bone_index, 0)
    has = (pm.bone_index >= 0)[:, None]
    bq = m3.quat_mul(wq[bi], pm.body_offset_quat)
    bp = wp[bi] + m3.quat_rotate(wq[bi], pm.body_offset_pos)
    # bodies without a bone stay at their bind placement
    rest_q = pm.body_offset_quat
    rest_p = pm.body_offset_pos
    return jnp.where(has, bq, rest_q), jnp.where(has, bp, rest_p)


def step(
    cfg: EngineConfig,
    pm: PhysicsModel,
    state: PhysicsState,
    dt: Array,
    wq: Array,  # (J, 4) bone world rotations (FK output)
    wp: Array,  # (J, 3) bone world positions
    tables: SolverTables | None = None,
    with_diag: bool = False,
) -> tuple[Array, Array, PhysicsState]:
    """Full physics step; returns updated bone world transforms + state.

    ``tables`` must be precomputed from the CONCRETE PhysicsModel when
    ``pm`` enters as a jit argument (get_tables runs host-side numpy).
    With ``with_diag`` a 4th value is returned: the max number of
    penetrating contacts dropped by the top-k cap across substeps."""
    if tables is None:
        tables = get_tables(pm)
    h = jnp.float32(cfg.physics_fixed_dt)
    gravity = jnp.asarray(cfg.gravity)

    # first-frame init: all bodies from bones, zero velocities
    init_q, init_p = bodies_from_bones(pm, wq, wp)
    fresh = ~state.initialized
    pos = jnp.where(fresh, init_p, state.position)
    quat = jnp.where(fresh, init_q, state.quat)
    lin_vel = jnp.where(fresh, 0.0, state.lin_vel)
    ang_vel = jnp.where(fresh, 0.0, state.ang_vel)

    # per-frame kinematic sync (physics.ts:649-702)
    kin = (~pm.is_dynamic & pm.valid)[:, None]
    pos = jnp.where(kin, init_p, pos)
    quat = jnp.where(kin, init_q, quat)
    lin_vel = jnp.where(kin, 0.0, lin_vel)
    ang_vel = jnp.where(kin, 0.0, ang_vel)

    inv_mass = jnp.where(pm.is_dynamic & pm.valid, pm.inv_mass, 0.0)
    dyn = (pm.is_dynamic & pm.valid)[:, None]

    # substep accumulator (Bullet stepSimulation semantics,
    # btDiscreteDynamicsWorld::stepSimulation): the *unclamped* substep count
    # is subtracted from the accumulator (excess time is dropped, remainder
    # always < h), while the executed count clamps to maxSubSteps — so a long
    # frame never puts the sim into a multi-frame catch-up spiral.
    accum = state.time_accum + dt
    n_total = jnp.floor(accum / h).astype(jnp.int32)
    accum = accum - n_total.astype(jnp.float32) * h
    n_sub = jnp.minimum(n_total, cfg.physics_max_substeps)

    lin_damp = jnp.power(
        jnp.clip(1.0 - pm.linear_damping, 0.0, 1.0), h
    )[:, None]
    ang_damp = jnp.power(
        jnp.clip(1.0 - pm.angular_damping, 0.0, 1.0), h
    )[:, None]

    # color-contiguous joint slices (one gather per step; slices are static)
    perm = tables.joint_perm
    jall = JointSlice(
        a=pm.joint_body_a[perm], b=pm.joint_body_b[perm],
        pos_a=pm.joint_pos_a[perm], quat_a=pm.joint_quat_a[perm],
        pos_b=pm.joint_pos_b[perm], quat_b=pm.joint_quat_b[perm],
        lin_min=pm.joint_lin_min[perm], lin_max=pm.joint_lin_max[perm],
        ang_min=pm.joint_ang_min[perm], ang_max=pm.joint_ang_max[perm],
        spring_lin=pm.joint_spring_lin[perm], spring_ang=pm.joint_spring_ang[perm],
    )
    cs = tables.color_starts
    slices = [
        jax.tree.map(lambda x: x[cs[c]:cs[c + 1]], jall)
        for c in range(len(cs) - 1)
        if cs[c + 1] > cs[c]
    ]

    def substep(_, carry):
        pos, quat, lin_vel, ang_vel, sat = carry
        # integrate velocities
        v = jnp.where(dyn, (lin_vel + gravity * h) * lin_damp, lin_vel)
        w = jnp.where(dyn, ang_vel * ang_damp, ang_vel)
        prev_pos, prev_quat = pos, quat
        p1 = jnp.where(dyn, pos + v * h, pos)
        q1 = jnp.where(dyn, _quat_add_rot(quat, w * h), quat)

        # broadphase once per substep (Bullet builds its manifold per step)
        act_i, act_j, dropped = _select_active_contacts(pm, tables, p1, q1)
        sat = jnp.maximum(sat, dropped)

        # stop-ERP slack: Bullet corrects only erp (0.475) of a limit/lock
        # violation per substep (BT_CONSTRAINT_STOP_ERP, physics.ts:383-385);
        # the iterations below converge to the erp-scaled target instead of
        # full enforcement. The slack is measured once from the integrated
        # (pre-solve) state, mirroring Bullet's bias-from-pre-solve-error.
        erp = cfg.physics_stop_erp
        if erp < 1.0:
            slacks = []
            for js in slices:
                v_lin, v_ang = _joint_violations(js, p1, q1)
                slacks.append(((1.0 - erp) * v_lin, (1.0 - erp) * v_ang))
        else:
            slacks = [None] * len(slices)

        # constraint solve
        def solver_iter(_, pq):
            p, q = pq
            ii_w = _inv_inertia_world(pm, q)
            for js, sl in zip(slices, slacks):
                p, q = _solve_joints_slice(
                    js, h, p, q, inv_mass, ii_w,
                    tables.has_lin_spring, tables.has_ang_spring, slack=sl,
                )
            p, q = _solve_contacts(pm, act_i, act_j, p, q, inv_mass, ii_w)
            return (p, q)

        p2, q2 = jax.lax.fori_loop(
            0, cfg.physics_solver_iterations, solver_iter, (p1, q1)
        )
        # velocity update from positions
        v2 = jnp.where(dyn, (p2 - prev_pos) / h, v)
        dq = m3.quat_mul(q2, m3.quat_conj(prev_quat))
        w2 = jnp.where(dyn, 2.0 * dq[:, :3] / h * jnp.sign(dq[:, 3:4]), w)
        # joint velocity stop (Bullet rows are velocity-level: the impulse
        # zeroes joint-space relative velocity every step; only the bias is
        # erp-scaled — see _joint_velocity_slice)
        ii2 = _inv_inertia_world(pm, q2)
        v2s, w2s = v2, w2
        for js in slices:
            v2s, w2s = _joint_velocity_slice(
                js, v2s, w2s, p2, q2, inv_mass, ii2)
        v2 = jnp.where(dyn, v2s, v2)
        w2 = jnp.where(dyn, w2s, w2)
        # velocity pass: contact friction + restitution (physics.ts:242-243)
        v3, w3 = _contact_velocity_pass(
            pm, act_i, act_j, p2, q2, v2, w2, v, w, inv_mass,
            _inv_inertia_world(pm, q2), h, jnp.linalg.norm(gravity),
        )
        v2 = jnp.where(dyn, v3, v2)
        w2 = jnp.where(dyn, w3, w2)
        return p2, q2, v2, w2, sat

    # dynamic trip count: only the substeps that actually run (typically 1-2
    # per frame) instead of a masked scan over the max
    pos, quat, lin_vel, ang_vel, contact_sat = jax.lax.fori_loop(
        0, n_sub, substep, (pos, quat, lin_vel, ang_vel, jnp.int32(0))
    )

    # write dynamic bodies back to bones: bone = body x offset^-1
    # (physics.ts:715-751)
    inv_oq = m3.quat_conj(pm.body_offset_quat)
    bone_q = m3.quat_mul(quat, inv_oq)
    bone_p = pos - m3.quat_rotate(bone_q, pm.body_offset_pos)
    ok = (
        pm.is_dynamic
        & pm.valid
        & (pm.bone_index >= 0)
        & jnp.all(jnp.isfinite(bone_p), axis=-1)
        & (jnp.max(jnp.abs(bone_p), axis=-1) < 1e6)
    )
    bi = jnp.maximum(pm.bone_index, 0)
    new_wq = wq.at[bi].set(jnp.where(ok[:, None], bone_q, wq[bi]))
    new_wp = wp.at[bi].set(jnp.where(ok[:, None], bone_p, wp[bi]))

    new_state = PhysicsState(
        position=pos,
        quat=quat,
        lin_vel=lin_vel,
        ang_vel=ang_vel,
        initialized=jnp.array(True),
        time_accum=accum,
    )
    if with_diag:
        return new_wq, new_wp, new_state, contact_sat
    return new_wq, new_wp, new_state
