"""CCD IK on the real model's leg chains (BASELINE config #3)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_leg_ik_reaches_displaced_target(model1_path):
    from reze_tpu.core.build import load_model
    from reze_tpu.core.types import EngineConfig
    from reze_tpu.skeleton import fk, ik as ik_mod

    built = load_model(model1_path, EngineConfig())
    m = built.arrays
    skel = m.skeleton
    assert m.ik.n_chains == 4  # both legs + both toes

    rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)
    trans = jnp.zeros((skel.j, 3))
    ik_bone = int(np.asarray(m.ik.ik_bone)[0])
    eff = int(np.asarray(m.ik.target)[0])
    # lift the IK handle: the ankle must follow
    trans = trans.at[ik_bone].set(jnp.asarray([0.5, 2.5, -2.0]))

    solved = jax.jit(
        lambda r, t: ik_mod.solve_ik(skel, m.ik, r, t)
    )(rot, trans)
    _, wp0 = fk.world_transforms(skel, rot, trans)
    _, wp1 = fk.world_transforms(skel, solved, trans)
    target = np.asarray(wp0)[ik_bone]
    d_before = np.linalg.norm(np.asarray(wp0)[eff] - target)
    d_after = np.linalg.norm(np.asarray(wp1)[eff] - target)
    assert d_after < 0.05, (d_before, d_after)

    # knee limit: the limited link's local X rotation stays in its range
    link = int(np.asarray(m.ik.links)[0, 0])
    from reze_tpu.core import math3d as m3

    e = np.asarray(m3.quat_to_euler_zxy(solved[link]))
    lmin = np.asarray(m.ik.link_limit_min)[0, 0]
    lmax = np.asarray(m.ik.link_limit_max)[0, 0]
    if bool(np.asarray(m.ik.link_has_limit)[0, 0]):
        assert e[0] >= lmin[0] - 1e-3 and e[0] <= lmax[0] + 1e-3


def test_ik_noop_when_target_at_rest(model1_path):
    from reze_tpu.core.build import load_model
    from reze_tpu.core.types import EngineConfig
    from reze_tpu.skeleton import fk, ik as ik_mod

    built = load_model(model1_path, EngineConfig())
    m = built.arrays
    skel = m.skeleton
    rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)
    trans = jnp.zeros((skel.j, 3))
    solved = ik_mod.solve_ik(skel, m.ik, rot, trans)
    # bind pose: effector already at the handle -> rotations stay ~identity
    _, wp0 = fk.world_transforms(skel, rot, trans)
    _, wp1 = fk.world_transforms(skel, solved, trans)
    np.testing.assert_allclose(np.asarray(wp0), np.asarray(wp1), atol=2e-2)
