"""Bone/material/uv morph application + VMD camera track.

The reference parses-then-skips all morphs (pmx-loader.ts:450-553) and
discards VMD camera records (vmd-loader.ts reads bone frames only); these
features are implemented from the PMX/VMD format semantics, so tests are
synthetic + real-asset structural checks.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from reze_tpu.anim import sampler
from reze_tpu.core import math3d as m3
from reze_tpu.core.types import EngineConfig, init_scene_state
from reze_tpu.formats.vmd import VMDMotion
from reze_tpu.skeleton import fk
from reze_tpu.step import make_step
from reze_tpu.testing import make_test_model

MODEL2 = "/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx"


def test_quat_from_rotvec_matches_axis_angle():
    axis = np.array([0.0, 1.0, 0.0])
    angle = 0.7
    q = np.asarray(m3.quat_from_rotvec(jnp.asarray(axis * angle)))
    expect = np.array([0, np.sin(angle / 2), 0, np.cos(angle / 2)])
    np.testing.assert_allclose(q, expect, atol=1e-6)
    # slerp(identity, q, w) == exp(w log q)
    w = 0.3
    qs = np.asarray(m3.quat_from_rotvec(jnp.asarray(axis * angle * w)))
    full = jnp.asarray(expect, jnp.float32)
    ident = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(
        qs, np.asarray(m3.quat_slerp(ident, full, jnp.float32(w))), atol=1e-6
    )


def _model_with_bone_morph():
    model = make_test_model()
    nm = model.morphs.offsets.shape[0]
    j = model.skeleton.j
    bone_trans = np.zeros((nm, j, 3), np.float32)
    bone_rotvec = np.zeros((nm, j, 3), np.float32)
    # morph 1: bone 2 yaws 90 deg and lifts by 0.5
    bone_rotvec[1, 2] = (0.0, np.pi / 2, 0.0)
    bone_trans[1, 2] = (0.0, 0.5, 0.0)
    morphs = model.morphs.replace(
        bone_trans=jnp.asarray(bone_trans),
        bone_rotvec=jnp.asarray(bone_rotvec),
        has_bone=True,
    )
    return model.replace(morphs=morphs)


def test_bone_morph_moves_world_transforms():
    model = _model_with_bone_morph()
    cfg = EngineConfig(width=64, height=64, tile_size=64, max_tris_per_bin=16,
                       enable_physics=False, enable_ik=False)
    step = make_step(model, cfg)
    track = sampler.empty_animation(model.skeleton.j, model.morphs.offsets.shape[0])
    breath = {
        "mask": jnp.zeros(model.skeleton.j, bool),
        "ranges": jnp.zeros(model.skeleton.j),
        "base": jnp.zeros((model.skeleton.j, 4)).at[:, 3].set(1.0),
        "half_cycle": jnp.float32(2.0), "start": jnp.float32(jnp.inf),
    }
    from reze_tpu.camera import Camera
    from reze_tpu.render.pipeline import make_lights

    cam = Camera(radius=5.0, target=(0.0, 2.0, 0.0), aspect=1.0)
    lights = make_lights(cfg)

    def world_of_bone3(weight):
        st = init_scene_state(model).replace(
            morph_weights=jnp.zeros(model.morphs.offsets.shape[0]).at[1].set(weight)
        )
        st2, _ = step(st, jnp.float32(1 / 60), cam.view_proj(), cam.position(),
                      lights, track, breath)
        wq, wp = fk.world_transforms(model.skeleton, st2.local_rot, st2.local_trans)
        return np.asarray(wp[3]), np.asarray(wq[2])

    p0, q0 = world_of_bone3(0.0)
    p1, q1 = world_of_bone3(1.0)
    ph, qh = world_of_bone3(0.5)
    # translation morph lifts the child bone by 0.5 at w=1, 0.25 at w=0.5
    assert abs((p1[1] - p0[1]) - 0.5) < 1e-5
    assert abs((ph[1] - p0[1]) - 0.25) < 1e-5
    # rotation morph turns bone 2 by 90 deg yaw at w=1, 45 at w=0.5
    yaw1 = 2 * np.arctan2(q1[1], q1[3])
    yawh = 2 * np.arctan2(qh[1], qh[3])
    assert abs(yaw1 - np.pi / 2) < 1e-4
    assert abs(yawh - np.pi / 4) < 1e-4


def test_material_morph_tables_from_real_model():
    import os
    if not os.path.exists(MODEL2):
        pytest.skip("reference assets unavailable")
    from reze_tpu.core.build import load_model

    built = load_model(MODEL2, EngineConfig())
    mo = built.arrays.morphs
    assert mo.has_material  # 塞尔凯特2 ships one material morph
    # the morph must actually modify some material's alpha path
    eff = np.abs(np.asarray(mo.mat_alpha_dmul)) + np.abs(np.asarray(mo.mat_alpha_add))
    assert eff.sum() > 0


def test_camera_track_sampling_and_pose():
    motion = VMDMotion()
    motion.camera_frames = np.array([0, 30], np.int64)
    motion.camera_distance = np.array([-10.0, -20.0], np.float32)
    motion.camera_position = np.array([[0, 10, 0], [0, 12, 0]], np.float32)
    motion.camera_rotation = np.array([[0, 0, 0], [0, np.pi / 2, 0]], np.float32)
    motion.camera_fov = np.array([30.0, 45.0], np.float32)

    track = sampler.build_camera_track(motion)
    d, tgt, rotv, fov = sampler.sample_camera(track, jnp.float32(0.5))
    assert abs(float(d) + 15.0) < 1e-5  # midpoint
    np.testing.assert_allclose(np.asarray(tgt), [0, 11, 0], atol=1e-5)
    assert abs(float(fov) - np.deg2rad(37.5)) < 1e-5

    vp, eye = sampler.camera_view_proj(d, tgt, rotv, fov, 1.0)
    # camera sits |distance| from the target
    assert abs(np.linalg.norm(np.asarray(eye - tgt)) - 15.0) < 1e-4
    # the target projects to the screen center
    clip = np.asarray(vp) @ np.array([0, 11, 0, 1.0])
    ndc = clip[:2] / clip[3]
    np.testing.assert_allclose(ndc, [0, 0], atol=1e-5)
    # at t=1s, ry=90deg puts the camera on the x axis
    d2, tgt2, rot2, fov2 = sampler.sample_camera(track, jnp.float32(1.0))
    _, eye2 = sampler.camera_view_proj(d2, tgt2, rot2, fov2, 1.0)
    e = np.asarray(eye2 - tgt2)
    assert abs(abs(e[0]) - 20.0) < 1e-3 and abs(e[2]) < 1e-3


def test_no_camera_track_returns_none():
    motion = VMDMotion()
    assert sampler.build_camera_track(motion) is None
