"""Gather-free deferred shading for the Pallas raster path.

TPU gathers run at ~70M elem/s (scalar-issue bound), so per-pixel texture
reads are the enemy. This path eliminates all of them except one albedo
fetch:

* fragment attributes arrive dense from the raster kernel (interpolated
  in-kernel; see kernels/raster_tpu.py)
* per-pixel material parameters (alpha, toon curve, edge color, texture id)
  are fetched with ONE one-hot matmul against a packed (M, C) table — an MXU
  op, not a gather
* toon ramps are evaluated as 8-segment piecewise-linear fits of the 256-LUT
  (toon contribution is a few percent of ambient in the reference lighting
  rig, so the fit error is far below perceptual threshold)
* world position is reconstructed from depth + the inverse view-projection
  instead of being interpolated/gathered
* albedo remains one (optionally bilinear) gather into the flattened texture
  stack — the irreducible random access.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Lights, Materials, TextureAtlas
from ..kernels import raster_tpu as RT

N_KNOTS = 9  # toon curve knots (8 segments)


class PackedMaterials(NamedTuple):
    """(M, C) parameter table consumed via one-hot matmul.

    Columns: [alpha, tex_id, tex_h, tex_w, tex_base, edge_r, edge_g, edge_b,
    edge_a, is_eye, is_hair, knots(9*3)]
    """

    table: jax.Array  # (M, C) f32
    atlas_flat: jax.Array  # (sum(H*W), 4) u8 flattened texture stack


N_FIXED = 11


def pack_materials(materials: Materials, atlas: TextureAtlas) -> PackedMaterials:
    m = materials.alpha.shape[0]
    lut = materials.toon_lut  # (M, 256, 3)
    knot_idx = np.linspace(0, 255, N_KNOTS).round().astype(np.int32)
    knots = lut[:, knot_idx, :]  # (M, 9, 3)

    n_tex, th, tw, _ = atlas.texels.shape
    # flatten the (possibly padded) stack; per-texture base offset + true dims
    flat = atlas.texels.reshape(-1, 4)
    base = jnp.arange(n_tex) * (th * tw)
    tex_id = materials.tex_id
    safe = jnp.maximum(tex_id, 0)
    hgt = atlas.sizes[safe, 0].astype(jnp.float32)
    wid = atlas.sizes[safe, 1].astype(jnp.float32)

    table = jnp.concatenate(
        [
            materials.alpha[:, None],
            tex_id[:, None].astype(jnp.float32),
            hgt[:, None],
            wid[:, None],
            base[safe][:, None].astype(jnp.float32),
            materials.edge_color,
            materials.is_eye[:, None].astype(jnp.float32),
            materials.is_hair[:, None].astype(jnp.float32),
            knots.reshape(m, N_KNOTS * 3),
        ],
        axis=1,
    )
    return PackedMaterials(table=table, atlas_flat=flat)


def fetch_params(mat_f: jax.Array, packed: PackedMaterials) -> jax.Array:
    """(P,) float material ids -> (P, C) params via one-hot MXU matmul."""
    m = packed.table.shape[0]
    onehot = (
        mat_f[:, None] == jnp.arange(m, dtype=jnp.float32)[None, :]
    ).astype(jnp.float32)
    return jnp.dot(onehot, packed.table, precision=jax.lax.Precision.DEFAULT)


def eval_toon(knots: jax.Array, x: jax.Array) -> jax.Array:
    """Piecewise-linear toon curve. knots (P, 9, 3), x (P,) in [0,1]."""
    f = jnp.clip(x, 0.0, 1.0) * (N_KNOTS - 1)
    # clamp so x == 1.0 lands in the last segment (t = 1) instead of matching
    # no branch and shading black
    seg = jnp.minimum(jnp.floor(f), N_KNOTS - 2)
    t = (f - seg)[:, None]
    out = jnp.zeros((x.shape[0], 3))
    for s in range(N_KNOTS - 1):
        val = knots[:, s] * (1.0 - t) + knots[:, s + 1] * t
        out = jnp.where((seg == s)[:, None], val, out)
    return out


def shade_material_fast(
    gbuf: jax.Array,  # (N_CH, P)
    packed: PackedMaterials,
    atlas_stride: int,
    lights: Lights,
    eye_pos: jax.Array,
    inv_view_proj: jax.Array,  # (4, 4)
    wp: int,
    hp: int,
    rim_intensity: float,
    stencil: jax.Array | None = None,  # (P,) int32
    stencil_eye_value: int = 1,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """-> (rgb (P,3), alpha (P,), cover (P,), mask (P,))."""
    mat_f = gbuf[RT.CH_MAT]
    mask = mat_f >= 0.0
    cover = gbuf[RT.CH_COVER]
    iw = jnp.maximum(gbuf[RT.CH_IW], 1e-8)
    u = gbuf[RT.CH_UIW] / iw
    v = gbuf[RT.CH_VIW] / iw
    n = jnp.stack([gbuf[RT.CH_NXIW], gbuf[RT.CH_NYIW], gbuf[RT.CH_NZIW]], axis=1) / iw[:, None]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=1, keepdims=True), 1e-8)

    params = fetch_params(jnp.maximum(mat_f, 0.0), packed)
    alpha = params[:, 0]
    is_hair = params[:, 10]
    knots = params[:, N_FIXED : N_FIXED + N_KNOTS * 3].reshape(-1, N_KNOTS, 3)

    # world position from depth (z_ndc) + inverse view-projection
    p = jnp.arange(wp * hp)
    px = (p % wp).astype(jnp.float32) + 0.5
    py = (p // wp).astype(jnp.float32) + 0.5
    ndc_x = px / (0.5 * wp) - 1.0
    ndc_y = 1.0 - py / (0.5 * hp)
    ndc_z = gbuf[RT.CH_Z]
    w_clip = 1.0 / iw
    clip = jnp.stack([ndc_x * w_clip, ndc_y * w_clip, ndc_z * w_clip, w_clip], axis=1)
    world = clip @ inv_view_proj.T
    wpos = world[:, :3]

    # albedo: the one gather
    tex_id = params[:, 1]
    h = jnp.maximum(params[:, 2], 1.0)
    w = jnp.maximum(params[:, 3], 1.0)
    base = params[:, 4]
    x = jnp.clip(jnp.floor(jnp.mod(u, 1.0) * w), 0.0, w - 1.0)
    y = jnp.clip(jnp.floor(jnp.mod(v, 1.0) * h), 0.0, h - 1.0)
    idx = (base + y * atlas_stride + x).astype(jnp.int32)
    texel = packed.atlas_flat[idx].astype(jnp.float32) * (1.0 / 255.0)
    albedo = jnp.where(tex_id[:, None] >= 0.0, texel[:, :3], 1.0)

    light_accum = jnp.broadcast_to(lights.ambient, mat_f.shape)[:, None] * jnp.ones(3)
    for i in range(lights.direction.shape[0]):
        active = (i < lights.count).astype(jnp.float32)
        l = -lights.direction[i]
        ndotl = jnp.maximum(n @ l, 0.0)
        toon = eval_toon(knots, ndotl)
        radiance = lights.color[i] * lights.intensity[i]
        light_accum = light_accum + active * toon * radiance * ndotl[:, None]

    view = eye_pos - wpos
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=1, keepdims=True), 1e-8)
    rim_f = 1.0 - jnp.maximum(jnp.sum(n * view, axis=1), 0.0)
    rgb = albedo * light_accum + (rim_f * rim_f)[:, None] * rim_intensity

    if stencil is not None:
        alpha = alpha * jnp.where(
            (stencil == stencil_eye_value) & (is_hair > 0.5), 0.5, 1.0
        )
    return rgb, alpha, cover, mask


def shade_outline_fast(
    gbuf: jax.Array, packed: PackedMaterials
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    mat_f = gbuf[RT.CH_MAT]
    mask = mat_f >= 0.0
    params = fetch_params(jnp.maximum(mat_f, 0.0), packed)
    edge = params[:, 5:9]
    return edge[:, :3], edge[:, 3], gbuf[RT.CH_COVER], mask


def blend(color, rgb, alpha, cover, mask):
    mask = mask & (alpha >= 0.001)
    a = (alpha * cover)[:, None]
    out = rgb * a + color * (1.0 - a)
    return jnp.where(mask[:, None], out, color)


# ---------------------------------------------------------------------------
# Layered deferred shading: all passes push fragments onto a 2-deep per-pixel
# layer stack (dense selects), then ONE unified shade runs per layer — the
# per-pixel albedo gather happens twice per frame instead of once per
# material pass. Exact whenever <=2 fragments survive opacity culling at a
# pixel (an opaque fragment empties the stack beneath it), which covers this
# content outside rare triple-translucent overlaps.
# ---------------------------------------------------------------------------


class LayerStack(NamedTuple):
    gbuf: tuple  # L x (N_CH, P)
    a_eff: tuple  # L x (P,) blend alpha (material alpha x cover x stencil)
    outline: tuple  # L x (P,) bool — flat edge-color fragment
    present: tuple  # L x (P,) bool


def empty_stack(p: int) -> LayerStack:
    z = jnp.zeros((RT.N_CH, p))
    zp = jnp.zeros((p,))
    f = jnp.zeros((p,), bool)
    return LayerStack((z, z), (zp, zp), (f, f), (f, f))


def push_layer(
    stack: LayerStack,
    gbuf: jax.Array,  # (N_CH, P)
    packed: PackedMaterials,
    outline: bool,
    stencil: jax.Array | None = None,
    stencil_eye_value: int = 1,
) -> LayerStack:
    """Push one pass's fragments in draw order."""
    mat_f = gbuf[RT.CH_MAT]
    cover = gbuf[RT.CH_COVER]
    params = fetch_params(jnp.maximum(mat_f, 0.0), packed)
    alpha = params[:, 8] if outline else params[:, 0]
    if stencil is not None and not outline:
        alpha = alpha * jnp.where(
            (stencil == stencil_eye_value) & (params[:, 10] > 0.5), 0.5, 1.0
        )
    a_eff = alpha * cover
    present = (mat_f >= 0.0) & (a_eff >= 0.001)
    opaque = present & (a_eff > 0.999)
    translucent = present & ~opaque

    l0g, l1g = stack.gbuf
    l0a, l1a = stack.a_eff
    l0o, l1o = stack.outline
    l0p, l1p = stack.present

    # below-slot: keep old l0 unless the new fragment displaces l1 into it or
    # erases everything (opaque)
    new_l0g = jnp.where(opaque[None, :], 0.0, jnp.where((translucent & l1p)[None, :], l1g, l0g))
    new_l0a = jnp.where(opaque, 0.0, jnp.where(translucent & l1p, l1a, l0a))
    new_l0o = jnp.where(opaque, False, jnp.where(translucent & l1p, l1o, l0o))
    new_l0p = jnp.where(opaque, False, jnp.where(translucent, l1p, l0p))

    new_l1g = jnp.where(present[None, :], gbuf, l1g)
    new_l1a = jnp.where(present, a_eff, l1a)
    new_l1o = jnp.where(present, bool(outline), l1o)
    new_l1p = present | l1p

    # when the new fragment is absent and l1 was empty, everything stays
    return LayerStack(
        (new_l0g, new_l1g), (new_l0a, new_l1a), (new_l0o, new_l1o), (new_l0p, new_l1p)
    )


def composite_stack(
    stack: LayerStack,
    packed: PackedMaterials,
    atlas_stride: int,
    lights: Lights,
    eye_pos: jax.Array,
    inv_view_proj: jax.Array,
    wp: int,
    hp: int,
    rim_intensity: float,
) -> jax.Array:
    """Shade both layers once and composite bottom-up -> (P, 3)."""
    out = jnp.zeros((wp * hp, 3))
    for l in range(2):
        g = stack.gbuf[l]
        toon_rgb, _, _, _ = shade_material_fast(
            g, packed, atlas_stride, lights, eye_pos, inv_view_proj,
            wp, hp, rim_intensity,
        )
        params = fetch_params(jnp.maximum(g[RT.CH_MAT], 0.0), packed)
        edge_rgb = params[:, 5:8]
        rgb = jnp.where(stack.outline[l][:, None], edge_rgb, toon_rgb)
        a = jnp.where(stack.present[l], stack.a_eff[l], 0.0)[:, None]
        out = rgb * a + out * (1.0 - a)
    return out
