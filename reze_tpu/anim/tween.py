"""Functional rotateBones tween state (model.ts:62-68, 158-194, 246-315).

The reference mutates per-bone tween buffers from the host; here the same
semantics are expressed as pure updates on a :class:`TweenState` pytree so
they can run inside the jitted step and be vmapped over characters.
Times are in seconds of engine time (the reference uses
``performance.now()`` milliseconds).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math3d as m3
from ..core.types import TweenState

Array = jax.Array


def _eval_tween(state: TweenState, t: Array) -> tuple[Array, Array]:
    """Current eased rotation of every active tween -> (rot (J,4), done (J,))."""
    dur = jnp.maximum(state.duration, 1e-3)
    u = jnp.clip((t - state.start_time) / dur, 0.0, 1.0)
    e = m3.ease_in_out(u)
    rot = m3.quat_slerp(state.start_quat, state.target_quat, e)
    return rot, u >= 1.0


def apply_tweens(
    state: TweenState, local_rot: Array, t: Array
) -> tuple[Array, TweenState]:
    """Per-frame tween update (model.ts:158-194): write eased rotations of
    active tweens into the pose; deactivate finished ones."""
    rot, done = _eval_tween(state, t)
    new_rot = jnp.where(state.active[:, None], rot, local_rot)
    new_state = state.replace(active=state.active & ~done)
    return new_rot, new_state


def start_tweens(
    state: TweenState,
    local_rot: Array,
    t: Array,
    bone_mask: Array,  # (J,) bool — bones being rotated
    targets: Array,  # (J, 4) target quats (only rows with bone_mask matter)
    duration: Array,  # () seconds; 0 => instant
) -> tuple[TweenState, Array]:
    """rotateBones (model.ts:246-315): capture the current (possibly
    mid-tween) rotation as the start, set target+duration.

    Returns (new tween state, new local_rot) — instant rotations (duration 0)
    write the pose directly and clear the tween.
    """
    targets = m3.quat_normalize(targets)
    current, _ = _eval_tween(state, t)
    start = jnp.where(state.active[:, None], current, local_rot)

    instant = duration <= 0.0
    sel = bone_mask[:, None]

    new_rot = jnp.where(sel & instant, targets, local_rot)
    new_state = TweenState(
        active=jnp.where(bone_mask, ~instant, state.active),
        start_quat=jnp.where(sel & ~instant, start, state.start_quat),
        target_quat=jnp.where(sel & ~instant, targets, state.target_quat),
        start_time=jnp.where(bone_mask & ~instant, t, state.start_time),
        duration=jnp.where(bone_mask & ~instant, duration, state.duration),
    )
    return new_state, new_rot
