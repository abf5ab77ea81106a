"""Linear-blend / SDEF skinning + vertex morph blending.

Replaces the reference's WGSL skinning vertex shaders (engine.ts:245-276,
431-462, 692-715) and skin-matrix compute pass (engine.ts:906-930).

Two equivalent formulations:

* ``gather``: per-vertex gather of 4 palette matrices + weighted sum —
  exact f32, matches the WGSL loop one-to-one.
* ``dense``: one MXU matmul ``(V, J) @ (J, 12)`` against the densified weight
  matrix built at load time — the TPU-idiomatic form for large crowds.

SDEF vertices (collapsed to BDEF2 by the reference at pmx-loader.ts:153-155)
get the full spherical deform here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math3d as m3
from ..core.types import Geometry, Morphs, Skinning

Array = jax.Array


def morphed_positions(geom: Geometry, morphs: Morphs, weights: Array) -> Array:
    """Base positions + weighted vertex-morph offsets (one small matmul)."""
    if morphs.n_morphs == 0:
        return geom.positions
    delta = jnp.einsum(
        "m,mvc->vc", weights, morphs.offsets, precision=jax.lax.Precision.HIGHEST
    )
    return geom.positions + delta


def blend_palette_gather(skin: Skinning, palette: Array) -> Array:
    """Per-vertex blended 3x4 skin matrix via gather (V, 3, 4)."""
    mats = palette[skin.joints]  # (V, 4, 3, 4)
    return jnp.einsum("vk,vkij->vij", skin.weights, mats)


def blend_palette_dense(skin: Skinning, palette: Array) -> Array:
    """Per-vertex blended 3x4 skin matrix via one dense matmul."""
    j = palette.shape[0]
    flat = palette.reshape(j, 12)
    blended = jnp.dot(
        skin.weights_dense, flat, precision=jax.lax.Precision.HIGHEST
    )
    return blended.reshape(-1, 3, 4)


def apply_skin(mats: Array, positions: Array, normals: Array) -> tuple[Array, Array]:
    """Apply per-vertex 3x4 matrices to positions (affine) and normals (linear)."""
    pos = jnp.einsum("vij,vj->vi", mats[:, :, :3], positions) + mats[:, :, 3]
    nrm = jnp.einsum("vij,vj->vi", mats[:, :, :3], normals)
    # normalize like the WGSL (engine.ts:272)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-8)
    return pos, nrm


def _sdef_positions(
    skin: Skinning,
    palette: Array,
    world_quat_palette: Array,  # (J, 4) rotation part of each skin matrix
    positions: Array,
) -> tuple[Array, Array]:
    """Spherical deform for SDEF vertices (canonical MMD formulation)."""
    j0 = skin.joints[:, 0]
    j1 = skin.joints[:, 1]
    w0 = skin.weights[:, 0:1]
    w1 = skin.weights[:, 1:2]
    m0 = palette[j0]  # (V, 3, 4)
    m1 = palette[j1]
    q0 = world_quat_palette[j0]
    q1 = world_quat_palette[j1]
    q = m3.quat_slerp(q0, q1, w1[:, 0])
    c = skin.sdef_c
    rw = skin.sdef_r0 * w0 + skin.sdef_r1 * w1
    ap0 = c + skin.sdef_r0 - rw
    ap1 = c + skin.sdef_r1 - rw
    cr0 = (c + ap0) * 0.5
    cr1 = (c + ap1) * 0.5

    def xform(m, p):
        return jnp.einsum("vij,vj->vi", m[:, :, :3], p) + m[:, :, 3]

    center = xform(m0, cr0) * w0 + xform(m1, cr1) * w1
    pos = m3.quat_rotate(q, positions - c) + center
    rot3 = m3.mat3_from_quat(q)
    return pos, rot3


def skin_vertices(
    geom: Geometry,
    skin: Skinning,
    palette: Array,  # (J, 3, 4) skin matrices
    morphs: Morphs | None = None,
    morph_weights: Array | None = None,
    mode: str = "gather",
    world_quat_palette: Array | None = None,
) -> tuple[Array, Array]:
    """Full vertex pipeline: morph blend -> LBS/SDEF -> (positions, normals)."""
    positions = (
        morphed_positions(geom, morphs, morph_weights)
        if morphs is not None and morph_weights is not None
        else geom.positions
    )
    if mode == "dense" and skin.weights_dense is not None:
        mats = blend_palette_dense(skin, palette)
    else:
        mats = blend_palette_gather(skin, palette)
    pos, nrm = apply_skin(mats, positions, geom.normals)

    if skin.is_sdef is not None and world_quat_palette is not None:
        sdef_pos, sdef_rot = _sdef_positions(skin, palette, world_quat_palette, positions)
        sdef_nrm = jnp.einsum("vij,vj->vi", sdef_rot, geom.normals)
        sdef_nrm = sdef_nrm / jnp.maximum(
            jnp.linalg.norm(sdef_nrm, axis=-1, keepdims=True), 1e-8
        )
        sel = skin.is_sdef[:, None]
        pos = jnp.where(sel, sdef_pos, pos)
        nrm = jnp.where(sel, sdef_nrm, nrm)
    return pos, nrm
