"""Regression guard: hair/skirt chains on the real model must stay bounded.

Catches solver-energy bugs (e.g. the merged-constraint regression where hair
exploded upward) without rendering: step the full 257-body/406-joint system
for a few simulated seconds from the bind pose and assert bodies stay near
their bind placement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def physics_scene(model2_path):
    from reze_tpu.core.build import load_model
    from reze_tpu.core.types import EngineConfig, init_scene_state
    from reze_tpu.skeleton import fk

    built = load_model(model2_path, EngineConfig())
    m = built.arrays
    skel = m.skeleton
    rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)
    wq, wp = fk.world_transforms(skel, rot, jnp.zeros((skel.j, 3)))
    return built, m, wq, wp


def test_bind_pose_chains_stay_bounded(physics_scene):
    from reze_tpu.core.types import EngineConfig, init_scene_state
    from reze_tpu.physics import solver

    built, m, wq, wp = physics_scene
    cfg = EngineConfig()
    state = init_scene_state(m).physics
    step = jax.jit(lambda s: solver.step(cfg, m.physics, s, jnp.float32(1 / 60), wq, wp))
    for _ in range(120):  # 2 simulated seconds
        nwq, nwp, state = step(state)
    pos = np.asarray(state.position)
    bind = np.asarray(m.physics.bind_pos)
    valid = np.asarray(m.physics.valid)
    assert np.isfinite(pos[valid]).all()
    drift = np.linalg.norm(pos[valid] - bind[valid], axis=1)
    # hair/skirt sags and contacts push bangs off the head collider (a few
    # units); an unstable solver drifts 10+ — that's what this guards
    assert drift.max() < 6.0, f"max drift {drift.max():.2f}"
    dyn = valid & np.asarray(m.physics.is_dynamic)
    rise = (pos[dyn, 1] - bind[dyn, 1]).max()
    assert rise < 3.5, f"bodies rose {rise:.2f} units"


def test_posed_chains_follow_bones(physics_scene):
    """Rotate the head; hair chain roots (kinematic) must follow while
    dynamics stay finite."""
    from reze_tpu.core import math3d as m3
    from reze_tpu.core.types import EngineConfig, init_scene_state
    from reze_tpu.physics import solver
    from reze_tpu.skeleton import fk

    built, m, _, _ = physics_scene
    skel = m.skeleton
    cfg = EngineConfig()
    head = built.bone_name_to_id.get("頭")
    if head is None:
        pytest.skip("no head bone")
    rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)
    rot = rot.at[head].set(m3.quat_from_euler_zxy(jnp.asarray([0.0, 0.8, 0.0])))
    wq, wp = fk.world_transforms(skel, rot, jnp.zeros((skel.j, 3)))
    state = init_scene_state(m).physics
    step = jax.jit(lambda s: solver.step(cfg, m.physics, s, jnp.float32(1 / 60), wq, wp))
    for _ in range(60):
        nwq, nwp, state = step(state)
    assert np.isfinite(np.asarray(state.position)).all()
    assert np.abs(np.asarray(state.position)).max() < 50.0
