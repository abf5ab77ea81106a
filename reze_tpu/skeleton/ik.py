"""Batched CCD inverse kinematics for PMX IK chains.

The reference parses PMX IK blocks and throws them away
(pmx-loader.ts:394-412); this module implements standard MMD CCD from the
PMX spec: per chain, iterate ``loop_count`` times over the links
(closest-to-effector first), each time rotating the link so the effector
approaches the IK handle's position, clamping the per-step angle by
``limit_angle * (link_index + 1)`` and applying per-link Euler limits (knees).

TPU formulation: all chains solve simultaneously under vmap; the chain FK is
recomputed incrementally from the (fixed) world transform of the chain base,
so the O(loops x links) sequential dependence touches only tiny per-chain
state inside a ``lax.fori_loop``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math3d as m3
from ..core.types import IKChains, Skeleton
from . import fk

Array = jax.Array


def _axis_angle_quat(axis: Array, angle: Array) -> Array:
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate([axis * s[..., None], jnp.cos(half)[..., None]], axis=-1)


def solve_ik(
    skel: Skeleton,
    ik: IKChains,
    local_rot: Array,  # (J, 4)
    local_trans: Array,  # (J, 3)
) -> Array:
    """Returns updated local rotations with IK applied."""
    if ik.n_chains == 0:
        return local_rot

    # Full FK with current locals: gives target positions and base transforms.
    wq, wp = fk.world_transforms(skel, local_rot, local_trans)
    rot_eff, pos_local = fk.effective_locals(skel, local_rot, local_trans)

    c, l = ik.c, ik.l
    links = ik.links  # (C, L) ordered closest-to-effector first
    links_safe = jnp.maximum(links, 0)
    link_valid = links >= 0

    # chain path top-down: reverse of links + the effector; parent of the
    # topmost valid link is the (fixed) base.
    top_idx = jnp.argmax(
        jnp.where(link_valid, jnp.arange(l)[None, :], -1), axis=1
    )  # (C,) index of topmost link
    top_bone = jnp.take_along_axis(links_safe, top_idx[:, None], axis=1)[:, 0]
    base_bone = skel.parent[top_bone]  # (C,), may be -1
    base_q = jnp.where(
        (base_bone >= 0)[:, None], wq[jnp.maximum(base_bone, 0)], jnp.asarray([0.0, 0.0, 0.0, 1.0])
    )
    base_p = jnp.where(
        (base_bone >= 0)[:, None], wp[jnp.maximum(base_bone, 0)], 0.0
    )

    target_pos = wp[jnp.maximum(ik.ik_bone, 0)]  # (C, 3) IK handle (fixed)
    effector = jnp.maximum(ik.target, 0)  # (C,)

    # Per-chain local data: path = [link[L-1], ..., link[0], effector]
    path = jnp.concatenate([links_safe[:, ::-1], effector[:, None]], axis=1)  # (C, L+1)
    path_valid = jnp.concatenate([link_valid[:, ::-1], jnp.ones((c, 1), bool)], axis=1)
    p_len = l + 1

    # gather static per-path-bone data
    path_pos_local = pos_local[path]  # (C, L+1, 3) bind+anim translation
    path_rot0 = rot_eff[path]  # (C, L+1, 4) starting local rotations

    def chain_fk(rots, bq, bp, pvalid, ppos):
        """Incremental FK down the path -> world (q, p) per path entry."""
        def body(carry, x):
            q_acc, p_acc = carry
            r, t, v = x
            q_new = m3.quat_mul(q_acc, r)
            p_new = p_acc + m3.quat_rotate(q_acc, t)
            q_out = jnp.where(v, q_new, q_acc)
            p_out = jnp.where(v, p_new, p_acc)
            return (q_out, p_out), (q_out, p_out)

        (_, _), (qs, ps) = jax.lax.scan(body, (bq, bp), (rots, ppos, pvalid))
        return qs, ps  # (L+1, 4), (L+1, 3)

    def solve_chain(ci):
        rots = path_rot0[ci]  # (L+1, 4) mutable local rotations along path
        bq, bp = base_q[ci], base_p[ci]
        pvalid = path_valid[ci]
        ppos = path_pos_local[ci]
        tgt = target_pos[ci]
        n_loops = ik.loop_count[ci]
        lim = ik.limit_angle[ci]

        def one_link(rots, li):
            """Rotate link li (0 = closest to effector)."""
            # link li sits at path position L-1-li (path is reversed links +
            # effector; invalid padded entries are FK-skipped)
            pi = l - 1 - li
            qs, ps = chain_fk(rots, bq, bp, pvalid, ppos)
            link_q = qs[pi]
            link_p = ps[pi]
            eff_p = ps[p_len - 1]
            inv = m3.quat_conj(link_q)
            v1 = m3.quat_rotate(inv, eff_p - link_p)
            v2 = m3.quat_rotate(inv, tgt - link_p)
            v1 = v1 / jnp.maximum(jnp.linalg.norm(v1), 1e-8)
            v2 = v2 / jnp.maximum(jnp.linalg.norm(v2), 1e-8)
            dot = jnp.clip(jnp.sum(v1 * v2), -1.0, 1.0)
            angle = jnp.arccos(dot)
            angle = jnp.minimum(angle, lim * (li + 1.0))
            axis = jnp.cross(v1, v2)
            axis_n = jnp.linalg.norm(axis)
            axis = axis / jnp.maximum(axis_n, 1e-8)
            dq = _axis_angle_quat(axis, angle)
            ok = (axis_n > 1e-8) & (angle > 1e-7) & link_valid[ci, li]
            new_rot = m3.quat_normalize(m3.quat_mul(rots[pi], dq))

            # per-link Euler limits (knees): clamp ZXY euler of the local rot
            def clamp(q):
                e = m3.quat_to_euler_zxy(q)
                e = jnp.clip(e, ik.link_limit_min[ci, li], ik.link_limit_max[ci, li])
                return m3.quat_from_euler_zxy(e)

            new_rot = jnp.where(ik.link_has_limit[ci, li], clamp(new_rot), new_rot)
            rots = jnp.where(ok, rots.at[pi].set(new_rot), rots)
            return rots

        def one_iter(it, rots):
            def step_link(li, r):
                return one_link(r, li)

            rots = jax.lax.fori_loop(0, l, step_link, rots)
            return rots

        def guarded_iter(it, rots):
            return jax.lax.cond(it < n_loops, lambda r: one_iter(it, r), lambda r: r, rots)

        rots = jax.lax.fori_loop(0, ik.max_loops, guarded_iter, rots)
        return rots

    new_path_rots = jax.vmap(solve_chain)(jnp.arange(c))  # (C, L+1, 4)

    # scatter back: only link entries (not the effector), only valid links,
    # and undo the append premultiplication is unnecessary because IK chains
    # (legs) have no append in practice — write the solved rotation as the
    # bone's local rotation.
    flat_bones = path[:, :l].reshape(-1)
    flat_rots = new_path_rots[:, :l].reshape(-1, 4)
    flat_valid = path_valid[:, :l].reshape(-1)
    out = local_rot
    out = out.at[flat_bones].set(
        jnp.where(flat_valid[:, None], flat_rots, out[flat_bones])
    )
    return out
