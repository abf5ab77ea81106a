"""Deferred fragment shading: toon ramp + directional lights + rim + blend.

Reproduces the reference model fragment shader (engine.ts:278-311) and the
outline fragment shader (engine.ts:465-473) over the rasterizer's per-pixel
G-buffer. All texture access is bilinear gathers against the stacked texture
array (repeat addressing, like the materialSampler at engine.ts:188-193).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import Lights, Materials, TextureAtlas

Array = jax.Array


def interpolate(
    corner_attr: Array,  # (T, 3, D) per-corner attributes
    corner_inv_w: Array,  # (T, 3)
    pix_tri: Array,  # (P,) pass-local tri id, -1 none
    bary: Array,  # (P, 3)
) -> Array:
    """Perspective-correct interpolation -> (P, D)."""
    safe = jnp.maximum(pix_tri, 0)
    attr = corner_attr[safe]  # (P, 3, D)
    iw = corner_inv_w[safe]  # (P, 3)
    wb = bary * iw
    denom = jnp.maximum(jnp.sum(wb, axis=-1, keepdims=True), 1e-12)
    return jnp.einsum("pk,pkd->pd", wb, attr) / denom


def sample_atlas_bilinear(
    atlas: TextureAtlas, tex_id: Array, uv: Array
) -> Array:
    """Bilinear, repeat-addressed texture fetch -> (P, 4) in [0, 1].

    ``tex_id`` < 0 returns white (reference throws for missing diffuse;
    we degrade gracefully)."""
    tid = jnp.maximum(tex_id, 0)
    hw = atlas.sizes[tid].astype(jnp.float32)  # (P, 2) = (h, w)
    h, w = hw[:, 0], hw[:, 1]
    fx = uv[:, 0] * w - 0.5
    fy = uv[:, 1] * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[:, None]
    ty = (fy - y0)[:, None]

    def wrap(v, n):
        return jnp.mod(v, n).astype(jnp.int32)

    x0i, x1i = wrap(x0, w), wrap(x0 + 1.0, w)
    y0i, y1i = wrap(y0, h), wrap(y0 + 1.0, h)

    tex = atlas.texels  # (N, H, W, 4) uint8
    c00 = tex[tid, y0i, x0i].astype(jnp.float32)
    c10 = tex[tid, y0i, x1i].astype(jnp.float32)
    c01 = tex[tid, y1i, x0i].astype(jnp.float32)
    c11 = tex[tid, y1i, x1i].astype(jnp.float32)
    top = c00 * (1 - tx) + c10 * tx
    bot = c01 * (1 - tx) + c11 * tx
    rgba = (top * (1 - ty) + bot * ty) / 255.0
    return jnp.where((tex_id >= 0)[:, None], rgba, 1.0)


def sample_toon(materials: Materials, mat_id: Array, ndotl: Array) -> Array:
    """Linear-filtered toon ramp lookup at (nDotL, 0.5) -> (P, 3)."""
    lut = materials.toon_lut  # (M, 256, 3)
    f = jnp.clip(ndotl, 0.0, 1.0) * 255.0
    i0 = jnp.floor(f).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, 255)
    t = (f - i0.astype(jnp.float32))[:, None]
    c0 = lut[mat_id, i0]
    c1 = lut[mat_id, i1]
    return c0 * (1 - t) + c1 * t


def shade_toon(
    materials: Materials,
    atlas: TextureAtlas,
    lights: Lights,
    mat_id: Array,  # (P,)
    uv: Array,  # (P, 2)
    normal: Array,  # (P, 3)
    world_pos: Array,  # (P, 3)
    eye_pos: Array,  # (3,)
    rim_intensity: float,
) -> Array:
    """Model fragment shader (engine.ts:288-310) -> (P, 3) linear rgb."""
    n = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-8)
    albedo = sample_atlas_bilinear(atlas, materials.tex_id[mat_id], uv)[:, :3]

    light_accum = jnp.broadcast_to(lights.ambient, (n.shape[0],))[:, None] * jnp.ones(3)
    for i in range(lights.direction.shape[0]):
        active = (i < lights.count).astype(jnp.float32)
        l = -lights.direction[i]
        ndotl = jnp.maximum(jnp.einsum("pc,c->p", n, l), 0.0)
        toon = sample_toon(materials, mat_id, ndotl)
        radiance = lights.color[i] * lights.intensity[i]
        light_accum = light_accum + active * toon * radiance * ndotl[:, None]

    view_dir = eye_pos - world_pos
    view_dir = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-8
    )
    rim_factor = 1.0 - jnp.maximum(jnp.sum(n * view_dir, axis=-1), 0.0)
    rim = (rim_factor * rim_factor)[:, None] * rim_intensity  # rimColor = (1,1,1)

    return albedo * light_accum + rim


def blend_into(
    color: Array,  # (P, 3) framebuffer
    rgb: Array,  # (P, 3) source
    alpha: Array,  # (P,) source alpha (material alpha x multipliers)
    cover: Array,  # (P,) MSAA coverage fraction of the winner
    mask: Array,  # (P,) bool fragment present
) -> Array:
    """src-alpha / one-minus-src-alpha blend (engine.ts:364-376), with MSAA
    folded in as coverage-weighted alpha."""
    mask = mask & (alpha >= 0.001)  # fragment discard (engine.ts:284-286)
    a = (alpha * cover)[:, None]
    out = rgb * a + color * (1.0 - a)
    return jnp.where(mask[:, None], out, color)
