"""Fast frame pipeline: Pallas raster kernels + gather-free shading.

Same pass semantics as render/pipeline.py (the XLA reference path), built on:
  * kernels/raster_tpu.py  — tile-resident rasterization with in-kernel
    attribute interpolation
  * render/shading_fast.py — one-hot material fetch, piecewise toon,
    world-pos reconstruction, single albedo gather

Tiles are (32, 128); the framebuffer is padded to multiples.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math3d as m3
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
from ..kernels import raster_tpu as RT
from . import post, raster, shading_fast as SF
from .pipeline import _gather_pass


class FastDims(NamedTuple):
    width: int
    height: int
    wp: int
    hp: int
    bx: int
    by: int

    @property
    def p(self) -> int:
        return self.hp * self.wp

    @property
    def b(self) -> int:
        return self.bx * self.by


def make_dims_fast(cfg: EngineConfig) -> FastDims:
    wp = round_up(cfg.width, RT.TILE_W)
    hp = round_up(cfg.height, RT.TILE_H)
    return FastDims(cfg.width, cfg.height, wp, hp, wp // RT.TILE_W, hp // RT.TILE_H)


def _untile_gbuf(gbuf: jax.Array, dims: FastDims) -> jax.Array:
    """(B, N_CH, 32, 128) -> (N_CH, P)."""
    g = gbuf.reshape(dims.by, dims.bx, RT.N_CH, RT.TILE_H, RT.TILE_W)
    return g.transpose(2, 0, 3, 1, 4).reshape(RT.N_CH, dims.p)


def render_frame_fast(
    model: ModelArrays,
    cfg: EngineConfig,
    dims: FastDims,
    packed: SF.PackedMaterials,
    pos: jax.Array,
    nrm: jax.Array,
    view_proj: jax.Array,
    eye_pos: jax.Array,
    lights: Lights,
    interpret: bool = False,
) -> jax.Array:
    atlas_stride = model.atlas.texels.shape[2]
    inv_vp = m3.mat4_inverse(view_proj)
    samples = cfg.msaa_samples

    zbuf = jnp.full((dims.b, samples, RT.TILE_H, RT.TILE_W), 1.0)
    color = jnp.zeros((dims.p, 3))
    stencil = jnp.zeros((dims.p,), jnp.int32)

    def run_raster(cls, cull, outline, depth_write):
        """Rasterize one pass, slicing it if it exceeds the per-call triangle
        limit; slice G-buffers merge with last-writer-wins + summed cover."""
        data = _gather_pass(model, pos, nrm, view_proj, cls, outline, cfg.outline_scale)
        t = data.valid.shape[0]
        n_slices = max(-(-t // RT.MAX_TRIS_PER_CALL), 1)
        zb = zbuf
        merged = None
        for si in range(n_slices):
            lo = si * RT.MAX_TRIS_PER_CALL
            hi = min(t, lo + RT.MAX_TRIS_PER_CALL)
            sl = slice(lo, hi)
            tri = raster.setup_triangles(
                data.corners_clip[sl], data.valid[sl], dims.wp, dims.hp, cull
            )
            tabs = RT.pack_tables(
                tri, data.corner_uv[sl], data.corner_nrm[sl], data.tri_mat[sl],
                dims.by, dims.bx,
            )
            zb, gbuf = RT.raster_pass_tpu(
                tabs, zb, bx=dims.bx, depth_write=depth_write,
                with_attrs=not outline, interpret=interpret,
            )
            if merged is None:
                merged = gbuf
            else:
                won = gbuf[:, RT.CH_MAT : RT.CH_MAT + 1] >= 0
                cover = jnp.minimum(
                    merged[:, RT.CH_COVER] + gbuf[:, RT.CH_COVER], 1.0
                )
                merged = jnp.where(won, gbuf, merged)
                merged = merged.at[:, RT.CH_COVER].set(cover)
        return zb, merged

    def shade_blend(color, gbuf, use_stencil=False):
        g = _untile_gbuf(gbuf, dims)
        rgb, alpha, cover, mask = SF.shade_material_fast(
            g, packed, atlas_stride, lights, eye_pos, inv_vp,
            dims.wp, dims.hp, cfg.rim_light_intensity,
            stencil=stencil if use_stencil else None,
            stencil_eye_value=cfg.stencil_eye_value,
        )
        return SF.blend(color, rgb, alpha, cover, mask), g

    if cfg.layered_shading:
        # Layered deferred path: rasterize all passes (depth state flows in
        # order), push fragments onto a 2-deep layer stack, shade ONCE per
        # layer (2 albedo gathers/frame instead of one per material pass).
        stack = SF.empty_stack(dims.p)
        zbuf, gbuf = run_raster(CLASS_OPAQUE, raster.CULL_NONE, False, True)
        stack = SF.push_layer(stack, _untile_gbuf(gbuf, dims), packed, False)
        zbuf, gbuf = run_raster(CLASS_EYE, raster.CULL_FRONT, False, True)
        g = _untile_gbuf(gbuf, dims)
        stack = SF.push_layer(stack, g, packed, False)
        stencil = jnp.where(
            (g[RT.CH_MAT] >= 0) & (g[RT.CH_COVER] > 0),
            jnp.int32(cfg.stencil_eye_value), stencil,
        )
        zbuf, gbuf = run_raster(CLASS_OPAQUE, raster.CULL_BACK, True, True)
        stack = SF.push_layer(stack, _untile_gbuf(gbuf, dims), packed, True)
        zbuf, gbuf = run_raster(CLASS_HAIR, raster.CULL_FRONT, False, True)
        stack = SF.push_layer(
            stack, _untile_gbuf(gbuf, dims), packed, False,
            stencil=stencil, stencil_eye_value=cfg.stencil_eye_value,
        )
        zbuf, gbuf = run_raster(CLASS_HAIR, raster.CULL_BACK, True, False)
        stack = SF.push_layer(stack, _untile_gbuf(gbuf, dims), packed, True)
        zbuf, gbuf = run_raster(CLASS_TRANSPARENT, raster.CULL_NONE, False, True)
        stack = SF.push_layer(stack, _untile_gbuf(gbuf, dims), packed, False)
        zbuf, gbuf = run_raster(CLASS_TRANSPARENT, raster.CULL_BACK, True, True)
        stack = SF.push_layer(stack, _untile_gbuf(gbuf, dims), packed, True)
        color = SF.composite_stack(
            stack, packed, atlas_stride, lights, eye_pos, inv_vp,
            dims.wp, dims.hp, cfg.rim_light_intensity,
        )
    else:
        # 1. opaque
        zbuf, gbuf = run_raster(CLASS_OPAQUE, raster.CULL_NONE, False, True)
        color, _ = shade_blend(color, gbuf)
        # 2. eyes (+ stencil write)
        zbuf, gbuf = run_raster(CLASS_EYE, raster.CULL_FRONT, False, True)
        color, g = shade_blend(color, gbuf)
        stencil = jnp.where(
            (g[RT.CH_MAT] >= 0) & (g[RT.CH_COVER] > 0),
            jnp.int32(cfg.stencil_eye_value),
            stencil,
        )
        # 3. opaque outlines
        zbuf, gbuf = run_raster(CLASS_OPAQUE, raster.CULL_BACK, True, True)
        g = _untile_gbuf(gbuf, dims)
        color = SF.blend(color, *SF.shade_outline_fast(g, packed))
        # 4. hair (stencil-split alpha)
        zbuf, gbuf = run_raster(CLASS_HAIR, raster.CULL_FRONT, False, True)
        color, _ = shade_blend(color, gbuf, use_stencil=True)
        # 5. hair outlines (no depth write)
        zbuf, gbuf = run_raster(CLASS_HAIR, raster.CULL_BACK, True, False)
        g = _untile_gbuf(gbuf, dims)
        color = SF.blend(color, *SF.shade_outline_fast(g, packed))
        # 6. transparent
        zbuf, gbuf = run_raster(CLASS_TRANSPARENT, raster.CULL_NONE, False, True)
        color, _ = shade_blend(color, gbuf)
        # 7. transparent outlines
        zbuf, gbuf = run_raster(CLASS_TRANSPARENT, raster.CULL_BACK, True, True)
        g = _untile_gbuf(gbuf, dims)
        color = SF.blend(color, *SF.shade_outline_fast(g, packed))

    img = color.reshape(dims.hp, dims.wp, 3)[: dims.height, : dims.width]
    if cfg.enable_bloom:
        img = post.apply_bloom(img, cfg.bloom_threshold, cfg.bloom_intensity)
    return jnp.clip(img, 0.0, 1.0)
