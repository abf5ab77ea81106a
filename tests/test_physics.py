import jax
import jax.numpy as jnp
import numpy as np

from reze_tpu.core.types import EngineConfig, PhysicsModel, PhysicsState
from reze_tpu.physics import solver


def make_pm(n=2, nj=1, *, spring_ang=0.0, contact_pair=False):
    f3 = lambda v=0.0: np.full((n, 3), v, np.float32)
    q0 = np.zeros((n, 4), np.float32)
    q0[:, 3] = 1
    jq = np.zeros((nj, 4), np.float32)
    jq[:, 3] = 1
    no_contact = np.ones(n, bool)
    group = np.zeros(n, np.int32)
    mask = np.zeros(n, np.int32)
    if contact_pair:
        no_contact[:] = False
        mask[:] = 0xFFFF
    return PhysicsModel(
        bone_index=np.arange(n, dtype=np.int32),
        shape=np.zeros(n, np.int32),
        size=np.full((n, 3), 0.5, np.float32),
        mass=np.array([0] + [1] * (n - 1), np.float32),
        inv_mass=np.array([0] + [1] * (n - 1), np.float32),
        inv_inertia_local=np.full((n, 3), 10.0, np.float32),
        linear_damping=np.zeros(n, np.float32),
        angular_damping=np.zeros(n, np.float32),
        restitution=np.zeros(n, np.float32),
        friction=np.full(n, 0.5, np.float32),
        is_dynamic=np.array([False] + [True] * (n - 1)),
        no_contact=no_contact,
        group=group,
        collision_mask=mask,
        body_offset_pos=f3(),
        body_offset_quat=q0,
        bind_pos=f3(),
        valid=np.ones(n, bool),
        joint_body_a=np.array([0] + [-1] * (nj - 1), np.int32),
        joint_body_b=np.array([1] + [-1] * (nj - 1), np.int32),
        joint_pos_a=np.array([[0, -1, 0]] + [[0, 0, 0]] * (nj - 1), np.float32),
        joint_quat_a=jq,
        joint_pos_b=np.array([[0, 1, 0]] + [[0, 0, 0]] * (nj - 1), np.float32),
        joint_quat_b=jq,
        joint_lin_min=np.zeros((nj, 3), np.float32),
        joint_lin_max=np.zeros((nj, 3), np.float32),
        joint_ang_min=np.full((nj, 3), -3.0, np.float32),
        joint_ang_max=np.full((nj, 3), 3.0, np.float32),
        joint_spring_lin=np.zeros((nj, 3), np.float32),
        joint_spring_ang=np.full((nj, 3), spring_ang, np.float32),
        joint_valid=np.array([True] + [False] * (nj - 1)),
        n_bodies=n,
        n_joints=1,
    )


def init_state(n):
    return PhysicsState(
        position=jnp.zeros((n, 3)),
        quat=jnp.zeros((n, 4)).at[:, 3].set(1.0),
        lin_vel=jnp.zeros((n, 3)),
        ang_vel=jnp.zeros((n, 3)),
        initialized=jnp.array(False),
        time_accum=jnp.float32(0.0),
    )


def run_steps(pm, wq, wp, n_frames, cfg=None):
    cfg = cfg or EngineConfig()
    pm = jax.tree.map(jnp.asarray, pm)
    st = init_state(pm.bone_index.shape[0])
    stepf = jax.jit(lambda s: solver.step(cfg, pm, s, jnp.float32(1 / 60), wq, wp))
    for _ in range(n_frames):
        nwq, nwp, st = stepf(st)
    return np.asarray(nwq), np.asarray(nwp), st


def test_pendulum_hangs_at_joint_distance():
    pm = make_pm()
    wq = jnp.zeros((2, 4)).at[:, 3].set(1.0)
    wp = jnp.asarray([[0.0, 10.0, 0.0], [0.5, 8.0, 0.0]])
    _, nwp, st = run_steps(pm, wq, wp, 180)
    pos = np.asarray(st.position)
    dist = np.linalg.norm(pos[1] - pos[0])
    np.testing.assert_allclose(dist, 2.0, atol=0.02)
    assert np.isfinite(pos).all()


def test_angular_spring_resists_swing():
    """A stiff angular spring suppresses the RELATIVE ANGLE between the
    joint bodies — the observable the spring actually acts on. (The bob's
    world-x offset is dominated by the stop-ERP-softened linear lock
    (physics_stop_erp=0.475, Bullet's BT_CONSTRAINT_STOP_ERP on all six
    axes, physics.ts:383-385), which the angular spring cannot influence;
    the old single-snapshot x comparison was phase-dependent and flipped
    sign run to run.)"""
    from reze_tpu.core import math3d as m3

    wq = jnp.zeros((2, 4)).at[:, 3].set(1.0)
    wp = jnp.asarray([[0.0, 10.0, 0.0], [1.5, 9.0, 0.0]])  # strongly displaced

    def settled_angle(spring_ang):
        pm = make_pm(spring_ang=spring_ang)
        pm = jax.tree.map(jnp.asarray, pm)
        cfg = EngineConfig()
        st = init_state(2)
        stepf = jax.jit(
            lambda s: solver.step(cfg, pm, s, jnp.float32(1 / 60), wq, wp))
        angles = []
        for _ in range(90):
            _, _, st = stepf(st)
            q_rel = m3.quat_mul(m3.quat_conj(st.quat[0]), st.quat[1])
            angles.append(float(jnp.abs(m3.quat_to_euler_zxy(q_rel)).max()))
        return np.mean(angles[60:])

    e_soft = settled_angle(0.0)
    e_stiff = settled_angle(500.0)
    assert e_soft > 0.05, e_soft  # the free pendulum is actually swinging
    assert e_stiff < 0.1 * e_soft, (e_stiff, e_soft)


def test_kinematic_bodies_follow_bones():
    pm = make_pm()
    wq = jnp.zeros((2, 4)).at[:, 3].set(1.0)
    wp0 = jnp.asarray([[0.0, 10.0, 0.0], [0.0, 8.0, 0.0]])
    cfg = EngineConfig()
    pmj = jax.tree.map(jnp.asarray, pm)
    st = init_state(2)
    stepf = jax.jit(lambda s, wp: solver.step(cfg, pmj, s, jnp.float32(1 / 60), wq, wp))
    _, _, st = stepf(st, wp0)
    # move the anchor bone; kinematic body must follow exactly
    wp1 = jnp.asarray([[3.0, 10.0, 0.0], [0.0, 8.0, 0.0]])
    _, _, st = stepf(st, wp1)
    np.testing.assert_allclose(np.asarray(st.position)[0], [3.0, 10.0, 0.0], atol=1e-6)


def test_contact_pushes_spheres_apart():
    pm = make_pm(n=3, nj=1, contact_pair=True)
    # body 2: dynamic, no joint, overlapping body 1
    wq = jnp.zeros((3, 4)).at[:, 3].set(1.0)
    wp = jnp.asarray([[0.0, 10.0, 0.0], [0.0, 8.0, 0.0], [0.3, 8.0, 0.0]])
    _, _, st = run_steps(pm, wq, wp, 5)
    pos = np.asarray(st.position)
    d = np.linalg.norm(pos[2] - pos[1])
    assert d > 0.6  # pushed apart toward sum of radii (1.0)
    assert np.isfinite(pos).all()


def test_dynamic_writes_back_to_bones():
    pm = make_pm()
    wq = jnp.zeros((2, 4)).at[:, 3].set(1.0)
    wp = jnp.asarray([[0.0, 10.0, 0.0], [0.0, 9.5, 0.0]])
    nwq, nwp, st = run_steps(pm, wq, wp, 60)
    # dynamic bone 1 must have moved down to hang at the joint
    assert nwp[1][1] < 9.0
    # kinematic bone 0 untouched
    np.testing.assert_allclose(nwp[0], [0.0, 10.0, 0.0])


def test_substep_accumulator():
    pm = jax.tree.map(jnp.asarray, make_pm())
    cfg = EngineConfig()
    st = init_state(2)
    wq = jnp.zeros((2, 4)).at[:, 3].set(1.0)
    wp = jnp.asarray([[0.0, 10.0, 0.0], [0.0, 8.0, 0.0]])
    # dt smaller than fixed step: first call banks time, runs 0 or 1 substeps
    _, _, st = solver.step(cfg, pm, st, jnp.float32(0.01), wq, wp)
    assert float(st.time_accum) < cfg.physics_fixed_dt
    # huge dt: clamped to max_substeps worth of simulation
    _, _, st2 = solver.step(cfg, pm, st, jnp.float32(1.0), wq, wp)
    assert np.isfinite(np.asarray(st2.position)).all()


def test_joint_coloring_no_conflicts():
    pm = make_pm()
    colors = solver.color_joints(jax.tree.map(jnp.asarray, pm))
    assert colors.shape[0] == pm.joint_body_a.shape[0]


# ---------------------------------------------------------------------------
# Contact friction + restitution (physics.ts:242-243 — Bullet sets both per
# body from PMX; combined multiplicatively across a pair)
# ---------------------------------------------------------------------------


def _ground_slider_pm(mu_slider, e_slider, mu_ground=1.0, e_ground=1.0):
    """Kinematic capsule 'ground rail' along world X + a dynamic sphere.

    The slider's inverse inertia is zeroed so friction acts as pure sliding
    deceleration (no rolling), making mu directly measurable.
    """
    pm = make_pm(n=2, nj=1, contact_pair=True)
    rot_z90 = np.array([0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)], np.float32)
    return pm.replace(
        shape=np.array([2, 0], np.int32),  # capsule, sphere
        size=np.array([[1.0, 40.0, 1.0], [0.5, 0.5, 0.5]], np.float32),
        body_offset_quat=np.stack([rot_z90, np.array([0, 0, 0, 1], np.float32)]),
        friction=np.array([mu_ground, mu_slider], np.float32),
        restitution=np.array([e_ground, e_slider], np.float32),
        inv_inertia_local=np.zeros((2, 3), np.float32),
        joint_valid=np.zeros(1, bool),
    )


def _run_with_velocity(pm, wp, v0, n_frames, cfg=None):
    cfg = cfg or EngineConfig()
    pmj = jax.tree.map(jnp.asarray, pm)
    wq = jnp.zeros((2, 4)).at[:, 3].set(1.0)
    st = init_state(2)
    stepf = jax.jit(lambda s: solver.step(cfg, pmj, s, jnp.float32(1 / 60), wq, wp))
    _, _, st = stepf(st)  # init from bones
    st = st.replace(lin_vel=jnp.asarray(v0))
    traj = []
    for _ in range(n_frames):
        _, _, st = stepf(st)
        traj.append(np.asarray(st.position[1]))
    return np.asarray(traj), st


def test_friction_decelerates_slider():
    # sphere resting on the rail (contact at y=1.0+0.5), sliding along x
    wp = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 1.48, 0.0]])
    v0 = np.array([[0, 0, 0], [5.0, 0, 0]], np.float32)
    traj_lo, st_lo = _run_with_velocity(_ground_slider_pm(0.02, 0.0), wp, v0, 30)
    traj_hi, st_hi = _run_with_velocity(_ground_slider_pm(0.04, 0.0), wp, v0, 30)
    vx_lo = float(st_lo.lin_vel[1, 0])
    vx_hi = float(st_hi.lin_vel[1, 0])
    # both decelerate, higher mu decelerates faster
    assert vx_lo < 5.0
    assert vx_hi < vx_lo
    # deceleration ratio tracks the friction ratio (2x), loosely
    dv_lo = 5.0 - vx_lo
    dv_hi = 5.0 - vx_hi
    assert 1.5 < dv_hi / max(dv_lo, 1e-6) < 2.6
    # and mu=0 keeps sliding at ~constant speed
    traj_0, st_0 = _run_with_velocity(_ground_slider_pm(0.0, 0.0), wp, v0, 30)
    assert float(st_0.lin_vel[1, 0]) > 4.9


def test_restitution_bounces():
    # drop the sphere onto the rail from 3 units up
    wp = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 4.5, 0.0]])
    v0 = np.zeros((2, 3), np.float32)
    traj_b, _ = _run_with_velocity(_ground_slider_pm(0.0, 0.8), wp, v0, 90)
    traj_d, _ = _run_with_velocity(_ground_slider_pm(0.0, 0.0), wp, v0, 90)
    y_b = traj_b[:, 1]
    y_d = traj_d[:, 1]
    rest_y = 1.5  # contact height
    # find first touch, then the post-bounce apex
    touch = int(np.argmax(y_b < rest_y + 0.05))
    apex_b = float(y_b[touch:].max()) - rest_y
    apex_d = float(y_d[touch:].max()) - rest_y
    drop_h = 3.0
    # e=0.8 combined: apex ~ e^2 * h = 0.64h; allow wide tolerance for the
    # positional-solve energy exchange
    assert 0.25 * drop_h < apex_b < 0.9 * drop_h
    # e=0: essentially no bounce
    assert apex_d < 0.2 * drop_h
    assert np.isfinite(traj_b).all() and np.isfinite(traj_d).all()
