"""Device-side VMD animation sampling.

The reference plays VMD clips by scheduling thousands of wall-clock
``setTimeout`` callbacks that each start an ease-in-out tween
(engine.ts:1425-1591). That design needs a host in the loop every frame; here
the timeline is a *pure function of simulation time*: a padded per-bone
keyframe table is sampled on-device each frame, so the whole step stays
inside one jit.

Two interpolation modes:

* ``"bezier"`` (default): true MMD easing from the per-key 64-byte Bezier
  blocks the reference discards (vmd-loader.ts:139-140), including bone
  translations (vmd-loader.ts:129-130). Per-channel cubic Bezier with
  endpoints (0,0)/(1,1), inverted by Newton iterations.
* ``"tween"``: reproduces the reference scheduler's steady-state behavior —
  quadratic ease-in-out between consecutive keys, rotation only, identity
  before the first key (engine.ts:1527-1553 semantics without timer jitter).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math3d as m3
from ..core.types import AnimationTrack
from ..formats.vmd import VMDMotion

Array = jax.Array


# ---------------------------------------------------------------------------
# Host-side track building
# ---------------------------------------------------------------------------


def build_animation(
    motion: VMDMotion,
    bone_name_to_id: dict[str, int],
    morph_name_to_id: dict[str, int],
    j_pad: int,
    nm_pad: int,
) -> AnimationTrack:
    tracks = motion.grouped_bone_tracks()
    mapped = {
        bone_name_to_id[name]: tr
        for name, tr in tracks.items()
        if name in bone_name_to_id
    }
    k = max([len(tr["t"]) for tr in mapped.values()], default=1)

    times = np.full((j_pad, k), np.inf, np.float32)
    rots = np.zeros((j_pad, k, 4), np.float32)
    rots[..., 3] = 1.0
    poss = np.zeros((j_pad, k, 3), np.float32)
    interp = np.zeros((j_pad, k, 4, 4), np.float32)
    # default linear easing: x1=y1=1/3*127/127... MMD default is (20,20,107,107)/127
    interp[..., 0] = 20.0 / 127.0
    interp[..., 1] = 20.0 / 127.0
    interp[..., 2] = 107.0 / 127.0
    interp[..., 3] = 107.0 / 127.0
    n_keys = np.zeros(j_pad, np.int32)
    has_track = np.zeros(j_pad, bool)

    for j, tr in mapped.items():
        n = len(tr["t"])
        times[j, :n] = tr["t"]
        rots[j, :n] = tr["rot"]
        poss[j, :n] = tr["pos"]
        interp[j, :n] = tr["interp"]
        # pad tail with the last key so clamping works
        times[j, n:] = np.inf
        rots[j, n:] = tr["rot"][-1]
        poss[j, n:] = tr["pos"][-1]
        n_keys[j] = n
        has_track[j] = True

    mtracks = motion.grouped_morph_tracks()
    mmapped = {
        morph_name_to_id[name]: tr
        for name, tr in mtracks.items()
        if name in morph_name_to_id
    }
    km = max([len(tr["t"]) for tr in mmapped.values()], default=1)
    mtimes = np.full((nm_pad, km), np.inf, np.float32)
    mvals = np.zeros((nm_pad, km), np.float32)
    mn = np.zeros(nm_pad, np.int32)
    for i, tr in mmapped.items():
        n = len(tr["t"])
        mtimes[i, :n] = tr["t"]
        mvals[i, :n] = tr["w"]
        mvals[i, n:] = tr["w"][-1]
        mn[i] = n

    return AnimationTrack(
        times=times,
        rotations=rots,
        positions=poss,
        interp=interp,
        n_keys=n_keys,
        has_track=has_track,
        morph_times=mtimes,
        morph_values=mvals,
        morph_n_keys=mn,
        duration=float(motion.duration_seconds()),
    )


def empty_animation(j_pad: int, nm_pad: int) -> AnimationTrack:
    return build_animation(VMDMotion(), {}, {}, j_pad, nm_pad)


# ---------------------------------------------------------------------------
# Device-side sampling
# ---------------------------------------------------------------------------


def bezier_y(x: Array, x1: Array, y1: Array, x2: Array, y2: Array) -> Array:
    """MMD easing: cubic Bezier through (0,0),(x1,y1),(x2,y2),(1,1).

    Solves s such that Bx(s)=x with Newton iterations (fixed count, jit-safe)
    then returns By(s).
    """

    def bx(s):
        inv = 1.0 - s
        return 3.0 * s * inv * inv * x1 + 3.0 * s * s * inv * x2 + s * s * s

    def dbx(s):
        inv = 1.0 - s
        return (
            3.0 * inv * inv * x1
            + 6.0 * s * inv * (x2 - x1)
            + 3.0 * s * s * (1.0 - x2)
        )

    s = x
    for _ in range(6):
        d = dbx(s)
        s = jnp.clip(s - (bx(s) - x) / jnp.where(jnp.abs(d) > 1e-6, d, 1.0), 0.0, 1.0)
    inv = 1.0 - s
    return 3.0 * s * inv * inv * y1 + 3.0 * s * s * inv * y2 + s * s * s


def _segment(times: Array, t: Array) -> tuple[Array, Array, Array]:
    """Per-track key segment: (k0, k1, u) with u in [0,1].

    ``times`` is (..., K) ascending with +inf padding.
    """
    k_next = jnp.sum((times <= t).astype(jnp.int32), axis=-1)  # first key > t
    kmax = times.shape[-1] - 1
    k1 = jnp.clip(k_next, 0, kmax)
    k0 = jnp.clip(k_next - 1, 0, kmax)
    t0 = jnp.take_along_axis(times, k0[..., None], axis=-1)[..., 0]
    t1 = jnp.take_along_axis(times, k1[..., None], axis=-1)[..., 0]
    denom = t1 - t0
    u = jnp.where(
        jnp.isfinite(t1) & (denom > 1e-9), (t - t0) / jnp.maximum(denom, 1e-9), 1.0
    )
    u = jnp.clip(jnp.where(k_next == 0, 0.0, u), 0.0, 1.0)
    return k0, k1, u


def sample_bones(
    track: AnimationTrack, t: Array, mode: str = "bezier"
) -> tuple[Array, Array]:
    """Sample all bone tracks at time ``t`` -> (rot (J,4), trans (J,3)).

    Untracked bones return identity/zero (callers gate on
    ``track.has_track``).
    """
    k0, k1, u = _segment(track.times, t)

    def take(arr, k):
        return jnp.take_along_axis(
            arr, k[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]

    r0 = take(track.rotations, k0)
    r1 = take(track.rotations, k1)
    p0 = take(track.positions, k0)
    p1 = take(track.positions, k1)

    if mode == "tween":
        e = m3.ease_in_out(u)
        rot = m3.quat_slerp(r0, r1, e)
        # tween mode matches the reference: identity before the first key
        before_first = t < track.times[:, 0]
        ident = jnp.zeros_like(rot).at[:, 3].set(1.0)
        rot = jnp.where(before_first[:, None], ident, rot)
        return rot, jnp.zeros_like(p0)

    # bezier mode: per-channel easing from the key we're easing *into* (k1)
    bez = jnp.take_along_axis(
        track.interp, k1[:, None, None, None].astype(jnp.int32), axis=1
    )[:, 0]  # (J, 4, 4)
    ux = bezier_y(u, bez[:, 0, 0], bez[:, 0, 1], bez[:, 0, 2], bez[:, 0, 3])
    uy = bezier_y(u, bez[:, 1, 0], bez[:, 1, 1], bez[:, 1, 2], bez[:, 1, 3])
    uz = bezier_y(u, bez[:, 2, 0], bez[:, 2, 1], bez[:, 2, 2], bez[:, 2, 3])
    ur = bezier_y(u, bez[:, 3, 0], bez[:, 3, 1], bez[:, 3, 2], bez[:, 3, 3])
    rot = m3.quat_slerp(r0, r1, ur)
    trans = p0 + jnp.stack([ux, uy, uz], axis=-1) * (p1 - p0)
    return rot, trans


def sample_morphs(track: AnimationTrack, t: Array) -> Array:
    """Linear morph weight sampling -> (Nm,)."""
    k0, k1, u = _segment(track.morph_times, t)
    v0 = jnp.take_along_axis(track.morph_values, k0[:, None], axis=1)[:, 0]
    v1 = jnp.take_along_axis(track.morph_values, k1[:, None], axis=1)[:, 0]
    return v0 + u * (v1 - v0)


# ---------------------------------------------------------------------------
# Breathing overlay (engine.ts:1609-1662)
# ---------------------------------------------------------------------------


def breathing_rotation(
    base_rot: Array,  # (Nb, 4) last-keyframe rotations of breathing bones
    ranges: Array,  # (Nb,) per-bone rotation range (radians-ish factor)
    t_since_start: Array,  # () seconds since breathing began
    half_cycle: Array,  # () seconds
) -> Array:
    """Steady-state breathing pose: oscillate around base with easeInOut
    half-cycles, starting with exhale (engine.ts:1661 ``animate(false)``)."""
    phase = t_since_start / half_cycle
    k = jnp.floor(phase)
    u = m3.ease_in_out(jnp.clip(phase - k, 0.0, 1.0))
    # half-cycle k targets -r (even) / +r (odd); starts from previous target
    sign_target = jnp.where(jnp.mod(k, 2.0) < 1.0, -1.0, 1.0)
    sign_start = jnp.where(k < 1.0, 0.0, -sign_target)

    def euler_x(sign):
        ang = sign[..., None] * ranges[:, None] * jnp.array([1.0, 0.0, 0.0])
        return m3.quat_from_euler_zxy(ang)

    q_start = m3.quat_mul(base_rot, euler_x(jnp.full_like(ranges, sign_start)))
    q_target = m3.quat_mul(base_rot, euler_x(jnp.full_like(ranges, sign_target)))
    return m3.quat_slerp(q_start, q_target, u)


# ---------------------------------------------------------------------------
# VMD camera track (beyond-reference: vmd-loader.ts reads bone frames only
# and discards the 61-byte camera records; we drive them)
# ---------------------------------------------------------------------------


class CameraTrack(NamedTuple):
    """Padded camera keyframes. MMD conventions: `distance` is stored
    negative (camera sits at target + R @ (0, 0, distance)), rotation is
    (rx, ry, rz) euler with the X angle display-negated, fov in degrees."""

    times: jax.Array  # (Kc,) seconds, +inf padded
    distance: jax.Array  # (Kc,)
    target: jax.Array  # (Kc, 3)
    rotation: jax.Array  # (Kc, 3)
    fov: jax.Array  # (Kc,) radians
    n_keys: int


def build_camera_track(motion, fps: float = 30.0) -> CameraTrack | None:
    """-> CameraTrack or None when the VMD has no camera frames."""
    import numpy as np

    n = int(motion.camera_frames.shape[0])
    if n == 0:
        return None
    order = np.argsort(motion.camera_frames, kind="stable")
    k = max(n, 2)
    times = np.full(k, np.inf, np.float32)
    times[:n] = motion.camera_frames[order] / fps
    if n == 1:
        times[1] = np.inf

    def pad(a, shape):
        out = np.zeros(shape, np.float32)
        out[:n] = a[order]
        if n < shape[0]:
            out[n:] = out[n - 1]
        return out

    return CameraTrack(
        times=jnp.asarray(times),
        distance=jnp.asarray(pad(motion.camera_distance, (k,))),
        target=jnp.asarray(pad(motion.camera_position, (k, 3))),
        rotation=jnp.asarray(pad(motion.camera_rotation, (k, 3))),
        fov=jnp.asarray(pad(np.deg2rad(motion.camera_fov), (k,))),
        n_keys=n,
    )


def sample_camera(track: CameraTrack, t: jax.Array):
    """Linear interpolation -> (distance, target (3,), rotation (3,), fov)."""
    k0, k1, u = _segment(track.times[None, :], t)
    k0, k1, u = k0[0], k1[0], u[0]

    def lerp(a):
        return a[k0] + u * (a[k1] - a[k0])

    return lerp(track.distance), lerp(track.target), lerp(track.rotation), lerp(track.fov)


def camera_view_proj(distance, target, rotation, fov, aspect,
                     near=0.05, far=1000.0):
    """MMD camera pose -> (view_proj (4,4), eye (3,)).

    eye = target + Ry(ry) Rx(-rx) Rz(rz) @ (0, 0, distance); distance < 0
    places the camera in front along the rotated -Z, matching MMD.
    """
    rx, ry, rz = -rotation[0], rotation[1], rotation[2]
    qy = jnp.stack([jnp.zeros(()), jnp.sin(ry / 2), jnp.zeros(()), jnp.cos(ry / 2)])
    qx = jnp.stack([jnp.sin(rx / 2), jnp.zeros(()), jnp.zeros(()), jnp.cos(rx / 2)])
    qz = jnp.stack([jnp.zeros(()), jnp.zeros(()), jnp.sin(rz / 2), jnp.cos(rz / 2)])
    q = m3.quat_mul(m3.quat_mul(qy, qx), qz)
    eye = target + m3.quat_rotate(q, jnp.stack([0.0 * distance, 0.0 * distance, distance]))
    up = m3.quat_rotate(q, jnp.asarray([0.0, 1.0, 0.0]))
    view = m3.look_at_lh(eye, target, up)
    proj = m3.perspective_lh(fov, jnp.asarray(aspect), jnp.asarray(near), jnp.asarray(far))
    return proj @ view, eye
