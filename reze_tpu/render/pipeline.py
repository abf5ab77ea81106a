"""Frame rendering pipeline: the reference's 5-phase pass ordering
(engine.ts:2123-2243) expressed as sequential rasterize+shade+blend stages
over one shared framebuffer state, all inside a single jit.

Pass order (engine.ts render()):
  1. opaque            cull none,  depth write, toon shading
  2. eyes              cull front, depth write, toon shading, stencil := 1
  3. opaque outlines   cull back,  depth write, flat edge color
  4. hair              cull front, depth write, toon shading; per-pixel
                       alpha x0.5 where stencil==1 (the reference's
                       over-eyes / over-non-eyes stencil split,
                       engine.ts:770-899, becomes a data-parallel select).
                       The reference's separate hair depth pre-pass
                       (engine.ts:724-767) is subsumed: a single depth-write
                       raster already yields the nearest-fragment-wins
                       semantics the pre-pass exists to enforce.
  5. hair outlines     cull back,  no depth write, flat edge color
  6. transparent       cull none,  depth write, toon shading
  7. transparent outl. cull back,  depth write, flat edge color
then bloom compose (render/post.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.types import (
    CLASS_EYE,
    CLASS_HAIR,
    CLASS_OPAQUE,
    CLASS_TRANSPARENT,
    EngineConfig,
    Lights,
    ModelArrays,
    round_up,
)
from . import post, raster, shading

Array = jax.Array


class FrameBuffer(NamedTuple):
    color: Array  # (P, 3) flat rgb
    zbuf: Array  # (B, S, tile, tile) per-sample depth
    stencil: Array  # (P,) int32


class RenderDims(NamedTuple):
    width: int
    height: int
    wp: int
    hp: int
    bx: int
    by: int
    tile: int

    @property
    def p(self) -> int:
        return self.hp * self.wp

    @property
    def b(self) -> int:
        return self.bx * self.by


def make_dims(cfg: EngineConfig) -> RenderDims:
    tile = cfg.tile_size
    wp = round_up(cfg.width, tile)
    hp = round_up(cfg.height, tile)
    return RenderDims(cfg.width, cfg.height, wp, hp, wp // tile, hp // tile, tile)


def init_framebuffer(dims: RenderDims, samples: int) -> FrameBuffer:
    return FrameBuffer(
        color=jnp.zeros((dims.p, 3)),
        zbuf=jnp.full((dims.b, samples, dims.tile, dims.tile), 1.0),
        stencil=jnp.zeros((dims.p,), jnp.int32),
    )


def _slice_rows(arr: Array, start: int, count: int) -> Array:
    return jax.lax.slice_in_dim(arr, start, start + count, axis=0)


def _untile(x: Array, dims: RenderDims) -> Array:
    img = raster.tiles_to_image(x, dims.by, dims.bx, dims.tile)
    return img.reshape((dims.p,) + x.shape[3:])


class _PassData(NamedTuple):
    corners_clip: Array  # (T, 3, 4)
    corner_uv: Array  # (T, 3, 2)
    corner_nrm: Array  # (T, 3, 3)
    corner_pos: Array  # (T, 3, 3)
    tri_mat: Array  # (T,)
    valid: Array  # (T,)


def _gather_pass(
    model: ModelArrays,
    pos: Array,
    nrm: Array,
    view_proj: Array,
    cls: int,
    outline: bool,
    outline_scale: float,
    uvs: Array | None = None,
) -> _PassData:
    geom = model.geometry
    if outline:
        ranges = geom.outline_class_ranges
        tris_all, mats_all = geom.outline_tris, geom.outline_tri_mat
    else:
        ranges = geom.class_ranges
        tris_all, mats_all = geom.tris, geom.tri_mat
    start, count, padded = ranges[cls]
    tris = _slice_rows(tris_all, start, padded)  # (T, 3)
    tri_mat = _slice_rows(mats_all, start, padded)
    valid = (
        jnp.arange(padded) < count
    )  # degenerate padding also self-rejects via zero area

    c_pos = pos[tris]  # (T, 3, 3)
    c_nrm = nrm[tris]
    c_uv = (geom.uvs if uvs is None else uvs)[tris]
    if outline:
        # MMD inverted hull: expand along skinned world normal by
        # edgeSize * 0.01 (engine.ts:459-461); edge size is per material.
        edge = model.materials.edge_size[tri_mat][:, None, None]
        c_pos = c_pos + c_nrm * (edge * outline_scale)
    clip = raster.project_corners(c_pos, view_proj)
    return _PassData(clip, c_uv, c_nrm, c_pos, tri_mat, valid)


def _raster(
    data: _PassData,
    fb: FrameBuffer,
    dims: RenderDims,
    cfg: EngineConfig,
    cull: int,
    depth_write: bool,
) -> tuple[raster.RasterOut, raster.TriSetup]:
    tri = raster.setup_triangles(data.corners_clip, data.valid, dims.wp, dims.hp, cull)
    k = min(data.valid.shape[0], cfg.max_tris_per_bin)
    k = max(round_up(k, 8), 8)
    bins = raster.bin_triangles(tri, dims.by, dims.bx, dims.tile, k)
    out = raster.rasterize_pass(
        tri, bins, fb.zbuf, tile=dims.tile, bx=dims.bx, depth_write=depth_write
    )
    return out, tri


def _shade_toon_pass(
    model: ModelArrays,
    cfg: EngineConfig,
    lights: Lights,
    eye_pos: Array,
    data: _PassData,
    tri: raster.TriSetup,
    out: raster.RasterOut,
    fb: FrameBuffer,
    dims: RenderDims,
    hair_stencil_alpha: bool = False,
    write_eye_stencil: bool = False,
) -> FrameBuffer:
    pix_tri = _untile(out.pix_tri, dims)
    bary = _untile(out.pix_bary, dims)
    cover = _untile(out.cover, dims)
    mask = pix_tri >= 0

    uv = shading.interpolate(data.corner_uv, tri.inv_w, pix_tri, bary)
    nrm = shading.interpolate(data.corner_nrm, tri.inv_w, pix_tri, bary)
    wpos = shading.interpolate(data.corner_pos, tri.inv_w, pix_tri, bary)
    mat = data.tri_mat[jnp.maximum(pix_tri, 0)]

    rgb = shading.shade_toon(
        model.materials, model.atlas, lights, mat, uv, nrm, wpos,
        eye_pos, cfg.rim_light_intensity,
    )
    alpha = model.materials.alpha[mat]
    if hair_stencil_alpha:
        # over-eyes hair gets 50% alpha (engine.ts:281-283 + stencil split)
        alpha = alpha * jnp.where(fb.stencil == cfg.stencil_eye_value, 0.5, 1.0)

    color = shading.blend_into(fb.color, rgb, alpha, cover, mask)
    stencil = fb.stencil
    if write_eye_stencil:
        stencil = jnp.where(
            mask & (cover > 0), jnp.int32(cfg.stencil_eye_value), stencil
        )
    return FrameBuffer(color, out.zbuf, stencil)


def _shade_outline_pass(
    model: ModelArrays,
    data: _PassData,
    out: raster.RasterOut,
    fb: FrameBuffer,
    dims: RenderDims,
) -> FrameBuffer:
    pix_tri = _untile(out.pix_tri, dims)
    cover = _untile(out.cover, dims)
    mask = pix_tri >= 0
    mat = data.tri_mat[jnp.maximum(pix_tri, 0)]
    edge = model.materials.edge_color[mat]
    color = shading.blend_into(fb.color, edge[:, :3], edge[:, 3], cover, mask)
    return FrameBuffer(color, out.zbuf, fb.stencil)


def _bary_at_center(tri: raster.TriSetup, pix_tri: Array, dims) -> Array:
    """Clamped barycentrics of winner ``pix_tri`` at pixel centers, (P, 3).

    Same formula as raster.rasterize_pass's winner bary — needed per SAMPLE
    winner for the true-MSAA color resolve."""
    safe = jnp.maximum(pix_tri, 0)
    idx = jnp.arange(dims.p)
    x = (idx % dims.wp).astype(jnp.float32) + 0.5
    y = (idx // dims.wp).astype(jnp.float32) + 0.5
    e = (tri.ea[safe] * x[:, None] + tri.eb[safe] * y[:, None]
         + tri.ec[safe])
    bary = jnp.clip(e * tri.inv_area2[safe][:, None], 0.0, 1.0)
    return bary / jnp.maximum(jnp.sum(bary, axis=-1, keepdims=True), 1e-8)


def _render_frame_color_resolve(
    model, cfg, dims, pos, nrm, view_proj, eye_pos, lights, uvs,
) -> Array:
    """True per-sample MSAA color resolve (engine.ts:72 multisample target,
    hardware resolve at engine.ts:2146): every sample carries its own color
    and stencil; fragments shade once per pixel (attributes at the center,
    WebGPU default) and write their covered samples; the final image is the
    sample average. The production paths approximate this by folding
    coverage into blend alpha; this oracle bounds that approximation."""
    s_count = cfg.msaa_samples
    scale = cfg.outline_scale
    zbuf = jnp.full((dims.b, s_count, dims.tile, dims.tile), 1.0)
    color = jnp.zeros((s_count, dims.p, 3))
    stencil = jnp.zeros((s_count, dims.p), jnp.int32)

    def sample_winners(out):
        # (B, S, th, tw) -> list of (P,) per-sample winner ids
        return [_untile(out.win[:, s], dims) for s in range(s_count)]

    def material_pass(state, cls, cull, hair=False, eye=False):
        zbuf, color, stencil = state
        data = _gather_pass(model, pos, nrm, view_proj, cls, False, scale,
                            uvs)
        tri = raster.setup_triangles(data.corners_clip, data.valid, dims.wp,
                                     dims.hp, cull)
        k = min(data.valid.shape[0], cfg.max_tris_per_bin)
        k = max(round_up(k, 8), 8)
        bins = raster.bin_triangles(tri, dims.by, dims.bx, dims.tile, k)
        out = raster.rasterize_pass(tri, bins, zbuf, tile=dims.tile,
                                    bx=dims.bx, depth_write=True)
        new_c, new_st = [], []
        for s, win_s in enumerate(sample_winners(out)):
            mask = win_s >= 0
            bary = _bary_at_center(tri, win_s, dims)
            uv = shading.interpolate(data.corner_uv, tri.inv_w, win_s, bary)
            nr = shading.interpolate(data.corner_nrm, tri.inv_w, win_s, bary)
            wp_ = shading.interpolate(data.corner_pos, tri.inv_w, win_s, bary)
            mat = data.tri_mat[jnp.maximum(win_s, 0)]
            rgb = shading.shade_toon(
                model.materials, model.atlas, lights, mat, uv, nr, wp_,
                eye_pos, cfg.rim_light_intensity,
            )
            alpha = model.materials.alpha[mat]
            if hair:
                alpha = alpha * jnp.where(
                    stencil[s] == cfg.stencil_eye_value, 0.5, 1.0)
            cs = shading.blend_into(
                color[s], rgb, alpha, jnp.ones((dims.p,)), mask)
            st = stencil[s]
            if eye:
                st = jnp.where(mask, jnp.int32(cfg.stencil_eye_value), st)
            new_c.append(cs)
            new_st.append(st)
        return out.zbuf, jnp.stack(new_c), jnp.stack(new_st)

    def outline_pass(state, cls, depth_write=True):
        zbuf, color, stencil = state
        data = _gather_pass(model, pos, nrm, view_proj, cls, True, scale)
        tri = raster.setup_triangles(data.corners_clip, data.valid, dims.wp,
                                     dims.hp, raster.CULL_BACK)
        k = min(data.valid.shape[0], cfg.max_tris_per_bin)
        k = max(round_up(k, 8), 8)
        bins = raster.bin_triangles(tri, dims.by, dims.bx, dims.tile, k)
        out = raster.rasterize_pass(tri, bins, zbuf, tile=dims.tile,
                                    bx=dims.bx, depth_write=depth_write)
        new_c = []
        for s, win_s in enumerate(sample_winners(out)):
            mask = win_s >= 0
            mat = data.tri_mat[jnp.maximum(win_s, 0)]
            edge = model.materials.edge_color[mat]
            new_c.append(shading.blend_into(
                color[s], edge[:, :3], edge[:, 3], jnp.ones((dims.p,)),
                mask))
        return out.zbuf, jnp.stack(new_c), stencil

    st = (zbuf, color, stencil)
    st = material_pass(st, CLASS_OPAQUE, raster.CULL_NONE)
    st = material_pass(st, CLASS_EYE, raster.CULL_FRONT, eye=True)
    st = outline_pass(st, CLASS_OPAQUE)
    st = material_pass(st, CLASS_HAIR, raster.CULL_FRONT, hair=True)
    st = outline_pass(st, CLASS_HAIR, depth_write=False)
    st = material_pass(st, CLASS_TRANSPARENT, raster.CULL_NONE)
    st = outline_pass(st, CLASS_TRANSPARENT)
    _, color, _ = st

    img = color.mean(0).reshape(dims.hp, dims.wp, 3)
    img = img[: dims.height, : dims.width]
    if cfg.enable_bloom:
        img = post.apply_bloom(img, cfg.bloom_threshold, cfg.bloom_intensity)
    return jnp.clip(img, 0.0, 1.0)


def render_frame(
    model: ModelArrays,
    cfg: EngineConfig,
    dims: RenderDims,
    pos: Array,  # (V, 3) skinned world positions
    nrm: Array,  # (V, 3) skinned world normals
    view_proj: Array,  # (4, 4)
    eye_pos: Array,  # (3,)
    lights: Lights,
    uvs: Array | None = None,
    mat_mod: tuple | None = None,
) -> Array:
    """Render one frame -> (H, W, 3) float rgb (pre-bloom-tonemap linear)."""
    if cfg.msaa_resolve == "color":
        assert mat_mod is None, "color-resolve oracle: static materials only"
        return _render_frame_color_resolve(
            model, cfg, dims, pos, nrm, view_proj, eye_pos, lights, uvs)
    fb = init_framebuffer(dims, cfg.msaa_samples)
    scale = cfg.outline_scale

    if mat_mod is not None:
        # material-morph alpha/edge-alpha factors (PMX kind 8), applied the
        # same way the fast paths scale push_tab (pipeline_tpu.py) so the
        # backends agree whenever a material morph is active
        a_scale, a_add, e_scale, e_add = mat_mod
        alpha_m = jnp.clip(model.materials.alpha * a_scale + a_add, 0.0, 1.0)
        edge_a = jnp.clip(
            model.materials.edge_color[:, 3] * e_scale + e_add, 0.0, 1.0
        )
        model = model.replace(
            materials=model.materials.replace(
                alpha=alpha_m,
                edge_color=model.materials.edge_color.at[:, 3].set(edge_a),
            )
        )

    def material_pass(fb, cls, cull, hair=False, eye=False):
        data = _gather_pass(model, pos, nrm, view_proj, cls, False, scale, uvs)
        out, tri = _raster(data, fb, dims, cfg, cull, depth_write=True)
        return _shade_toon_pass(
            model, cfg, lights, eye_pos, data, tri, out, fb, dims,
            hair_stencil_alpha=hair, write_eye_stencil=eye,
        )

    def outline_pass(fb, cls, depth_write=True):
        data = _gather_pass(model, pos, nrm, view_proj, cls, True, scale)
        out, _ = _raster(data, fb, dims, cfg, raster.CULL_BACK, depth_write)
        return _shade_outline_pass(model, data, out, fb, dims)

    fb = material_pass(fb, CLASS_OPAQUE, raster.CULL_NONE)
    fb = material_pass(fb, CLASS_EYE, raster.CULL_FRONT, eye=True)
    fb = outline_pass(fb, CLASS_OPAQUE)
    fb = material_pass(fb, CLASS_HAIR, raster.CULL_FRONT, hair=True)
    fb = outline_pass(fb, CLASS_HAIR, depth_write=False)
    fb = material_pass(fb, CLASS_TRANSPARENT, raster.CULL_NONE)
    fb = outline_pass(fb, CLASS_TRANSPARENT)

    img = fb.color.reshape(dims.hp, dims.wp, 3)[: dims.height, : dims.width]
    if cfg.enable_bloom:
        img = post.apply_bloom(img, cfg.bloom_threshold, cfg.bloom_intensity)
    return jnp.clip(img, 0.0, 1.0)


def make_lights(cfg: EngineConfig) -> Lights:
    from ..core.types import DEFAULT_LIGHTS, MAX_LIGHTS
    import numpy as np

    direction = np.zeros((MAX_LIGHTS, 3), np.float32)
    color = np.zeros((MAX_LIGHTS, 3), np.float32)
    intensity = np.zeros(MAX_LIGHTS, np.float32)
    for i, (d, c, it) in enumerate(DEFAULT_LIGHTS):
        d = np.asarray(d, np.float32)
        direction[i] = d / np.linalg.norm(d)
        color[i] = c
        intensity[i] = it
    return Lights(
        ambient=jnp.float32(cfg.ambient),
        direction=jnp.asarray(direction),
        color=jnp.asarray(color),
        intensity=jnp.asarray(intensity),
        count=jnp.int32(len(DEFAULT_LIGHTS)),
    )
