"""Tutorial v4 — bones, skinning and rotateBone.

Reference: web/app/tutorial/engines/v4.ts:47-723 adds the skeleton: local
bone rotations compose into world matrices by walking parents
(v4.ts:500-539), a compute shader builds skin matrices = world x
inverseBind (v4.ts:588-659), and the vertex shader blends 4 of them per
vertex (LBS). The TPU translation, in order of appearance:

  * FK — a `lax.fori_loop` over bones in parent-before-child order; each
    step composes one bone with its already-computed parent. (The real
    engine replaces this O(depth) chain with a pointer-doubling scan —
    reze_tpu/skeleton/fk.py — but the sequential loop is the idea.)
  * skin matrices — `world @ inverse_bind` is ONE batched (J, 4, 4)
    einsum; the reference needed a whole compute pipeline for this line.
  * LBS — gather 4 matrices per vertex, weighted sum, one matmul per
    vertex batch: pos' = sum_i w_i * (M_{j_i} @ pos).

`rotate_bone` then is: write a quaternion into the local-rotation array,
re-run the SAME jitted function. Two poses of 腰 (waist) and 首 (neck)
render side by side, like the reference's canvas4 sliders.

Run: python examples/tutorial/v4.py [out.png]
"""

import os
import sys

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from examples.tutorial.v1 import look_at, perspective  # noqa: E402
from examples.tutorial.v3 import MODEL, SIZE, render  # noqa: E402


def quat_mul(a, b):
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], -1)


def quat_rotate(q, v):
    u, w = q[..., :3], q[..., 3:4]
    return (v * (w * w - jnp.sum(u * u, -1, keepdims=True))
            + 2.0 * u * jnp.sum(u * v, -1, keepdims=True)
            + 2.0 * w * jnp.cross(u, v))


def fk_sequential(parents, local_t, local_rot):
    """World (quat, pos) per bone by walking parents (v4.ts:500-539).

    PMX guarantees parent index < child index, so one forward fori_loop
    suffices; the root's parent is -1. ``local_t`` is the parent-relative
    bind translation the loader already stores (Skeleton.bind_trans)."""
    j = parents.shape[0]

    def body(i, wq_wp):
        wq, wp = wq_wp
        p = parents[i]
        pq = jnp.where(p >= 0, wq[jnp.maximum(p, 0)],
                       jnp.asarray([0.0, 0.0, 0.0, 1.0]))
        pp = jnp.where(p >= 0, wp[jnp.maximum(p, 0)], jnp.zeros(3))
        q = quat_mul(pq, local_rot[i])
        t = pp + quat_rotate(pq, local_t[i])
        return wq.at[i].set(q), wp.at[i].set(t)

    wq0 = jnp.zeros((j, 4)).at[:, 3].set(1.0)
    wp0 = jnp.zeros((j, 3))
    return jax.lax.fori_loop(0, j, body, (wq0, wp0))


def skin(m, local_rot):
    """FK -> skin transforms -> LBS of positions and normals."""
    skel, sk = m.skeleton, m.skinning
    wq, wp = fk_sequential(skel.parent, skel.bind_trans, local_rot)
    bind_pos = -skel.inv_bind_trans  # absolute bind position per bone
    # skin transform of bone b: x -> rotate(wq) (x - bind) + wp —
    # the translation-only inverse bind the reference uses
    # (pmx-loader.ts:791-824)
    g = m.geometry
    idx, wgt = sk.joints, sk.weights            # (V, 4) each
    rel = g.positions[:, None, :] - bind_pos[idx]        # (V, 4, 3)
    pos = jnp.sum(wgt[..., None] * (quat_rotate(wq[idx], rel) + wp[idx]), 1)
    nrm = jnp.sum(wgt[..., None] * quat_rotate(wq[idx],
                                               jnp.broadcast_to(
                                                   g.normals[:, None, :],
                                                   rel.shape)), 1)
    return pos, nrm


def main():
    from PIL import Image

    from reze_tpu.core.build import load_model
    from reze_tpu.core.types import EngineConfig

    built = load_model(MODEL, EngineConfig(width=SIZE, height=SIZE))
    m = built.arrays
    j = m.skeleton.j
    name_to_id = built.bone_name_to_id

    cam_eye = jnp.asarray([0.0, 17.1, 0.0]) + 13.5 * jnp.asarray(
        [np.sin(np.pi), 0.12, np.cos(np.pi)])
    vp = perspective(jnp.pi / 4, 1.0, 0.05, 100.0) @ look_at(
        cam_eye, jnp.asarray([0.0, 17.1, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))

    @jax.jit
    def frame(local_rot):
        pos, nrm = skin(m, local_rot)
        g = m.geometry.replace(positions=pos, normals=nrm)
        return render(m.replace(geometry=g), vp)

    rest = jnp.zeros((j, 4)).at[:, 3].set(1.0)

    def rotate_bone(rot, name, quat):
        return rot.at[name_to_id[name]].set(jnp.asarray(quat))

    posed = rotate_bone(rest, "腰", [0.0, 0.259, 0.0, 0.966])   # 30° yaw
    posed = rotate_bone(posed, "首", [0.131, 0.0, 0.0, 0.991])  # 15° nod

    img = np.concatenate([np.asarray(frame(rest)), np.asarray(frame(posed))],
                         axis=1)
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tut_v4.png"
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(out)
    print("v4 ->", out)


if __name__ == "__main__":
    main()
