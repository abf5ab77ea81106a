import jax
import jax.numpy as jnp
import numpy as np

from reze_tpu.anim import sampler, tween
from reze_tpu.core.types import TweenState
from reze_tpu.formats.vmd import VMDMotion, load_vmd
import oracle


def make_motion():
    m = VMDMotion()
    m.bone_names = ["a", "a", "a", "b"]
    m.bone_frames = np.array([0, 30, 60, 15])
    m.bone_positions = np.array(
        [[0, 0, 0], [1, 2, 3], [2, 0, 0], [0, 0, 0]], np.float32
    )
    qa = oracle.quat_from_euler_zxy(0.3, 0.0, 0.0)
    qb = oracle.quat_from_euler_zxy(0.0, 0.5, 0.0)
    m.bone_rotations = np.array(
        [[0, 0, 0, 1], qa, qb, [0, 0, 0, 1]], np.float32
    )
    # linear easing control points
    interp = np.zeros((4, 4, 4), np.float32)
    interp[..., 0] = interp[..., 1] = 1.0 / 3.0
    interp[..., 2] = interp[..., 3] = 2.0 / 3.0
    m.bone_interp = interp
    return m


def build_track(m):
    return sampler.build_animation(m, {"a": 0, "b": 1}, {}, j_pad=4, nm_pad=1)


def test_sample_at_keyframes_exact():
    tr = build_track(make_motion())
    for t, exp_rot, exp_pos in [
        (0.0, [0, 0, 0, 1], [0, 0, 0]),
        (1.0, oracle.quat_from_euler_zxy(0.3, 0, 0), [1, 2, 3]),
        (2.0, oracle.quat_from_euler_zxy(0, 0.5, 0), [2, 0, 0]),
        (5.0, oracle.quat_from_euler_zxy(0, 0.5, 0), [2, 0, 0]),  # clamp past end
    ]:
        rot, pos = sampler.sample_bones(tr, jnp.float32(t))
        np.testing.assert_allclose(np.asarray(rot)[0], exp_rot, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pos)[0], exp_pos, atol=1e-5)


def test_linear_bezier_midpoint():
    tr = build_track(make_motion())
    rot, pos = sampler.sample_bones(tr, jnp.float32(0.5))
    exp = oracle.quat_slerp([0, 0, 0, 1], oracle.quat_from_euler_zxy(0.3, 0, 0), 0.5)
    np.testing.assert_allclose(np.asarray(rot)[0], exp, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pos)[0], [0.5, 1.0, 1.5], atol=1e-3)


def test_tween_mode_matches_ease_in_out():
    tr = build_track(make_motion())
    rot, pos = sampler.sample_bones(tr, jnp.float32(0.25), mode="tween")
    e = oracle.ease_in_out(0.25)
    exp = oracle.quat_slerp([0, 0, 0, 1], oracle.quat_from_euler_zxy(0.3, 0, 0), e)
    np.testing.assert_allclose(np.asarray(rot)[0], exp, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pos), 0.0)  # tween mode: rotation only


def test_bezier_easing_nonlinear():
    # strong ease-in: x1=(1,0), x2=(1,0) pulls y below x for mid inputs
    y = sampler.bezier_y(
        jnp.asarray(0.5), jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(1.0), jnp.asarray(0.0)
    )
    assert float(y) < 0.2
    # identity-ish control points give y == x
    y2 = sampler.bezier_y(
        jnp.asarray(0.37), jnp.asarray(1 / 3), jnp.asarray(1 / 3), jnp.asarray(2 / 3), jnp.asarray(2 / 3)
    )
    np.testing.assert_allclose(float(y2), 0.37, atol=1e-4)


def test_real_vmd_sampling(pool_vmd_path):
    motion = load_vmd(pool_vmd_path)
    names = {n: i for i, n in enumerate(dict.fromkeys(motion.bone_names))}
    tr = sampler.build_animation(motion, names, {}, j_pad=64, nm_pad=1)
    f = jax.jit(lambda t: sampler.sample_bones(tr, t))
    for t in [0.0, 0.33, 0.77, 1.5]:
        rot, pos = f(jnp.float32(t))
        norms = np.linalg.norm(np.asarray(rot), axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_tween_state_lifecycle():
    j = 4
    state = TweenState(
        active=jnp.zeros(j, bool),
        start_quat=jnp.zeros((j, 4)).at[:, 3].set(1.0),
        target_quat=jnp.zeros((j, 4)).at[:, 3].set(1.0),
        start_time=jnp.zeros(j),
        duration=jnp.ones(j),
    )
    rot = jnp.zeros((j, 4)).at[:, 3].set(1.0)
    target = jnp.asarray(oracle.quat_from_euler_zxy(0.8, 0, 0), jnp.float32)
    targets = jnp.broadcast_to(target, (j, 4))
    mask = jnp.asarray([True, False, False, False])

    state, rot = tween.start_tweens(state, rot, jnp.float32(10.0), mask, targets, jnp.float32(2.0))
    assert bool(state.active[0]) and not bool(state.active[1])

    # halfway: eased slerp
    new_rot, state2 = tween.apply_tweens(state, rot, jnp.float32(11.0))
    e = oracle.ease_in_out(0.5)
    exp = oracle.quat_slerp([0, 0, 0, 1], np.asarray(target), e)
    np.testing.assert_allclose(np.asarray(new_rot)[0], exp, atol=1e-5)
    assert bool(state2.active[0])

    # done: exactly target, deactivated
    new_rot, state3 = tween.apply_tweens(state2, new_rot, jnp.float32(12.5))
    np.testing.assert_allclose(np.asarray(new_rot)[0], np.asarray(target), atol=1e-6)
    assert not bool(state3.active[0])

    # instant rotation (duration 0) writes pose directly
    state4, rot4 = tween.start_tweens(
        state3, new_rot, jnp.float32(13.0), mask, -targets, jnp.float32(0.0)
    )
    np.testing.assert_allclose(np.asarray(rot4)[0], -np.asarray(target), atol=1e-6)
    assert not bool(state4.active[0])


def test_retarget_mid_tween_captures_current():
    # reference semantics (model.ts:275-301): retargeting an active tween
    # starts from the current eased rotation, not the old start
    j = 1
    ident = jnp.zeros((j, 4)).at[:, 3].set(1.0)
    state = TweenState(
        active=jnp.zeros(j, bool), start_quat=ident, target_quat=ident,
        start_time=jnp.zeros(j), duration=jnp.ones(j),
    )
    q1 = jnp.asarray([oracle.quat_from_euler_zxy(1.0, 0, 0)], jnp.float32)
    mask = jnp.asarray([True])
    state, rot = tween.start_tweens(state, ident, jnp.float32(0.0), mask, q1, jnp.float32(2.0))
    # at t=1 (halfway), retarget to identity
    state, rot = tween.start_tweens(state, rot, jnp.float32(1.0), mask, ident, jnp.float32(1.0))
    e = oracle.ease_in_out(0.5)
    expected_start = oracle.quat_slerp([0, 0, 0, 1], np.asarray(q1)[0], e)
    np.testing.assert_allclose(np.asarray(state.start_quat)[0], expected_start, atol=1e-5)


def test_breathing_steady_state():
    base = jnp.asarray([oracle.quat_from_euler_zxy(0.2, 0, 0)], jnp.float32)
    ranges = jnp.asarray([0.05])
    half = jnp.float32(2.5)
    # at the end of the first half-cycle: base * euler(-r)
    q = sampler.breathing_rotation(base, ranges, jnp.float32(2.5) - 1e-3, half)
    exp = oracle.quat_mul(np.asarray(base)[0], oracle.quat_from_euler_zxy(-0.05, 0, 0))
    np.testing.assert_allclose(np.asarray(q)[0], exp, atol=1e-3)
    # end of second half-cycle: base * euler(+r)
    q = sampler.breathing_rotation(base, ranges, jnp.float32(5.0) - 1e-3, half)
    exp = oracle.quat_mul(np.asarray(base)[0], oracle.quat_from_euler_zxy(0.05, 0, 0))
    np.testing.assert_allclose(np.asarray(q)[0], exp, atol=1e-3)
