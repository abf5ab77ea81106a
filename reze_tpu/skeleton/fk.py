"""Vectorized skeleton forward kinematics.

Replaces the reference's recursive per-bone ``computeWorldMatrices``
(model.ts:330-420) with a pointer-doubling parallel scan over the bone tree:
all J bones compose their (quat, pos) rigid transforms with their 2^k-th
ancestor in ceil(log2(depth)) vectorized steps — no recursion, no
data-dependent control flow, fully vmap-able over characters.

Semantics matched exactly:
* local matrix = T(bind + anim_trans) * R * T(append_trans)
  (model.ts:397-402: bind translation first, then rotation, then the
  append-move translation — which therefore gets rotated by R).
* append/grant rotation (model.ts:354-385): premultiply
  slerp(identity, sign(ratio)*appendParentLocalRot, |ratio|), reading the
  append parent's *raw* local rotation (no chaining), ratio clamped to
  [-1, 1], negative ratio conjugates.
* append move (model.ts:388-393): add appendParent's local translation scaled
  by the *unclamped* ratio.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math3d as m3
from ..core.types import Skeleton

Array = jax.Array


def effective_locals(
    skel: Skeleton, local_rot: Array, local_trans: Array
) -> tuple[Array, Array]:
    """Apply append/grant inheritance; returns per-bone (rot, parent-space pos)."""
    ap = skel.append_parent
    ap_safe = jnp.maximum(ap, 0)
    ratio = jnp.clip(skel.append_ratio, -1.0, 1.0)
    has_rot = (ap >= 0) & skel.append_rotate & (jnp.abs(ratio) > 1e-6)
    has_move = (ap >= 0) & skel.append_move & (jnp.abs(ratio) > 1e-6)

    ap_rot = local_rot[ap_safe]
    signed = jnp.where(
        (ratio < 0)[:, None],
        ap_rot * jnp.asarray([-1.0, -1.0, -1.0, 1.0]),
        ap_rot,
    )
    ident = jnp.zeros_like(ap_rot).at[:, 3].set(1.0)
    q_app = m3.quat_slerp(ident, signed, jnp.abs(ratio))
    rot_eff = jnp.where(has_rot[:, None], m3.quat_mul(q_app, local_rot), local_rot)

    # append move uses the raw (unclamped) ratio, per model.ts:389
    add = jnp.where(
        has_move[:, None], local_trans[ap_safe] * skel.append_ratio[:, None], 0.0
    )
    # local = T(bind + anim) * R * T(add)  =>  pos = bind + anim + R @ add
    pos = skel.bind_trans + local_trans + m3.quat_rotate(rot_eff, add)
    return rot_eff, pos


def compose_world(
    skel: Skeleton, rot: Array, pos: Array
) -> tuple[Array, Array]:
    """Pointer-doubling composition: world[i] = world[parent] * local[i]."""

    def body(_, carry):
        q, p, anc = carry
        anc_safe = jnp.maximum(anc, 0)
        has = (anc >= 0)[:, None]
        qa = q[anc_safe]
        pa = p[anc_safe]
        q_new = jnp.where(has, m3.quat_mul(qa, q), q)
        p_new = jnp.where(has, pa + m3.quat_rotate(qa, p), p)
        anc_new = jnp.where(anc >= 0, anc[anc_safe], -1)
        return q_new, p_new, anc_new

    q, p, _ = jax.lax.fori_loop(
        0, skel.doubling_steps, body, (rot, pos, skel.parent)
    )
    return q, p


def world_transforms(
    skel: Skeleton, local_rot: Array, local_trans: Array
) -> tuple[Array, Array]:
    """Full pose evaluation: (world_quat (J,4), world_pos (J,3))."""
    rot, pos = effective_locals(skel, local_rot, local_trans)
    return compose_world(skel, rot, pos)


def world_matrices(skel: Skeleton, local_rot: Array, local_trans: Array) -> Array:
    q, p = world_transforms(skel, local_rot, local_trans)
    return m3.mat4_from_pos_quat(p, q)


def skin_palette(skel: Skeleton, world_quat: Array, world_pos: Array) -> Array:
    """Per-bone skin matrices (J, 3, 4): world * T(inverseBindTranslation).

    Equivalent to the reference's skin-matrix compute shader
    (engine.ts:906-930) with the translation-only inverse bind
    (pmx-loader.ts:791-824).
    """
    rot3 = m3.mat3_from_quat(world_quat)
    trans = world_pos + m3.quat_rotate(world_quat, skel.inv_bind_trans)
    return jnp.concatenate([rot3, trans[..., :, None]], axis=-1)
