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


def test_ik_append_link_warns():
    """A model whose IK-link bone has append-rotate inheritance must warn at
    load time: the CCD solver writes raw locals and would silently mis-solve
    such a chain (skeleton/ik.py scatter-back; VERDICT r3 weak #7)."""
    import warnings

    from reze_tpu.core.build import build_ik
    from reze_tpu.formats.pmx import (
        FLAG_APPEND_ROTATE, FLAG_IK, PMXBone, PMXIK, PMXIKLink,
    )

    def bone(i, flags=0, append=-1, ik=None):
        return PMXBone(
            name=f"b{i}", english_name="", position=np.zeros(3),
            parent=i - 1, transform_order=0, flags=flags,
            append_parent=append, ik=ik,
        )

    link = PMXIKLink(bone=1, has_limit=False,
                     limit_min=np.zeros(3), limit_max=np.zeros(3))
    chain = PMXIK(target=2, loop_count=4, limit_angle=1.0, links=[link])
    bones = [
        bone(0),
        bone(1, flags=FLAG_APPEND_ROTATE, append=0),  # link with append!
        bone(2),
        bone(3, flags=FLAG_IK, ik=chain),
    ]

    class FakePMX:
        pass

    pmx = FakePMX()
    pmx.bones = bones
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        build_ik(pmx)
    assert any("append-rotate" in str(x.message) for x in w), (
        [str(x.message) for x in w])

    # and a clean chain stays silent
    bones[1].flags = 0
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        build_ik(pmx)
    assert not any("append-rotate" in str(x.message) for x in w)
