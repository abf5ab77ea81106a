"""Checkpoint / resume: exact SceneState round-trip, mid-clip resume
equality, and structural validation on load.

The reference has no persistence (SURVEY.md §5); the design claim here is
that the whole dynamic state is one pytree, so save/resume is exact —
these tests pin that claim.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reze_tpu import checkpoint
from reze_tpu.anim import sampler
from reze_tpu.core.types import EngineConfig, init_scene_state
from reze_tpu.render import pipeline
from reze_tpu.step import make_step
from reze_tpu.testing import make_test_model


def _tiny_setup():
    cfg = EngineConfig(width=64, height=64, tile_size=64, max_tris_per_bin=16)
    model = make_test_model()
    dims = pipeline.make_dims(cfg)
    lights = pipeline.make_lights(cfg)
    state = init_scene_state(model).replace(playing=jnp.array(True))
    j = model.skeleton.j
    nm = model.morphs.offsets.shape[0]
    track = jax.device_put(sampler.empty_animation(j, nm))
    breath = {
        "mask": jnp.zeros(j, bool),
        "ranges": jnp.zeros(j),
        "base": jnp.zeros((j, 4)).at[:, 3].set(1.0),
        "half_cycle": jnp.float32(2.0),
        "start": jnp.float32(jnp.inf),
    }
    step = jax.jit(make_step(model, cfg, dims))
    cam_vp = jnp.eye(4)
    eye = jnp.asarray([0.0, 3.0, -8.0])
    dt = jnp.float32(1 / 60)

    def advance(s, n):
        frame = None
        for _ in range(n):
            s, frame = step(s, dt, cam_vp, eye, lights, track, breath)
        return s, frame

    return state, advance


def test_roundtrip_exact(tmp_path):
    state, advance = _tiny_setup()
    s5, _ = advance(state, 5)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_scene(path, s5)
    restored = checkpoint.load_scene(path, s5)
    for a, b in zip(jax.tree.leaves(s5), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_midclip_resume_equality(tmp_path):
    """Save at frame 5, continue to frame 10; resume from the checkpoint and
    run 5 frames: the rendered frames must match bit-exactly."""
    state, advance = _tiny_setup()
    s5, _ = advance(state, 5)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_scene(path, s5)

    s10, frame_a = advance(s5, 5)
    resumed = checkpoint.load_scene(path, s5)
    s10b, frame_b = advance(resumed, 5)

    np.testing.assert_array_equal(np.asarray(frame_a), np.asarray(frame_b))
    for a, b in zip(jax.tree.leaves(s10), jax.tree.leaves(s10b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_rejects_structure_mismatch(tmp_path):
    state, _ = _tiny_setup()
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_scene(path, state)

    # structurally different pytree (same leaf count not required): drop the
    # physics sub-state by replacing it with a plain array
    class NotState(dict):
        pass

    bad_like = dataclasses.replace(state, tween=None) if dataclasses.is_dataclass(state) else None
    if bad_like is None:
        # fall back: mutate via .replace on the NamedTuple/pytree helper
        bad_like = state.replace(tween=None)
    with pytest.raises(ValueError, match="structure mismatch"):
        checkpoint.load_scene(path, bad_like)


def test_load_rejects_shape_mismatch(tmp_path):
    state, _ = _tiny_setup()
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_scene(path, state)
    bad = state.replace(local_rot=jnp.zeros((1, 4)))
    with pytest.raises(ValueError, match="shape"):
        checkpoint.load_scene(path, bad)
