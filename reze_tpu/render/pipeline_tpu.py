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
from ..kernels import shade_tpu as ST
from . import post, raster, shading_fast as SF
from .pipeline import _gather_pass


def _fetch_albedo(atlas_flat, o, base, dims, *, bilinear: bool, half_res: bool):
    """Albedo from the shade kernel's texel index channels -> (P, 3).

    nearest: one gather at base + (fx>.5)dx + (fy>.5)dy.
    bilinear: 4 gathers + lerp (engine.ts:189-190 linear sampler parity).
    half_res: gather every other pixel and replicate 2x2 — used for the
    occluded layer, visible only through translucent fragments.
    """
    tex = o[base + ST.O_TEX]
    dxdy = o[base + ST.O_DXDY]
    fx = o[base + ST.O_FX]
    fy = o[base + ST.O_FY]
    dx = jnp.mod(dxdy, 2.0)
    dy = (dxdy - dx) * 0.5
    valid = tex >= 0.0

    def g(idx_f):
        idx = jnp.maximum(idx_f, 0.0).astype(jnp.int32)
        if half_res:
            h2, w2 = dims.hp // 2, dims.wp // 2
            # subsample rows via a contiguous reshape-slice, columns via a
            # lane-stride slice; upsample via broadcast + reshape (no
            # gather-based resize, no channel-last repeats)
            i2 = idx.reshape(h2, 2, dims.wp)[:, 0, :]
            i4 = i2[:, ::2]
            tx = atlas_flat[i4.reshape(-1)].astype(jnp.float32) * (1.0 / 255.0)
            tx = tx.reshape(h2, w2, 4)
            tx = jnp.broadcast_to(tx[:, :, None, :], (h2, w2, 2, 4))
            tx = tx.reshape(h2, dims.wp, 4)
            tx = jnp.broadcast_to(tx[:, None, :, :], (h2, 2, dims.wp, 4))
            return tx.reshape(dims.p, 4)
        return atlas_flat[idx].astype(jnp.float32) * (1.0 / 255.0)

    if bilinear:
        t00 = g(tex)
        t10 = g(tex + dx)
        t01 = g(tex + dy)
        t11 = g(tex + dx + dy)
        wx = fx[:, None]
        wy = fy[:, None]
        texel = (
            t00 * (1 - wx) * (1 - wy) + t10 * wx * (1 - wy)
            + t01 * (1 - wx) * wy + t11 * wx * wy
        )
    else:
        near = tex + jnp.where(fx > 0.5, dx, 0.0) + jnp.where(fy > 0.5, dy, 0.0)
        texel = g(near)
    return jnp.where(valid[:, None], texel[:, :3], 1.0)



def _fetch_albedo_quad(quad_flat, o, base, dims, *, half_res: bool):
    """Bilinear albedo in ONE gather per pixel from the quad-packed atlas
    (core/build.py build_quad_chain): row tex holds the full 2x2 footprint
    [t00 t10 t01 t11] as 16 u8, so only the lerp with (fx, fy) remains.
    Exact match of _fetch_albedo's 4-gather bilinear path by construction
    (the neighbor clamping is baked into the quad rows)."""
    tex = o[base + ST.O_TEX]
    fx = o[base + ST.O_FX]
    fy = o[base + ST.O_FY]
    valid = tex >= 0.0
    idx = jnp.maximum(tex, 0.0).astype(jnp.int32)
    if half_res:
        h2, w2 = dims.hp // 2, dims.wp // 2
        i2 = idx.reshape(h2, 2, dims.wp)[:, 0, :]
        i4 = i2[:, ::2]
        q = quad_flat[i4.reshape(-1)].astype(jnp.float32)  # (h2*w2, 16)
        q = q.reshape(h2, w2, 16)
        q = jnp.broadcast_to(q[:, :, None, :], (h2, w2, 2, 16))
        q = q.reshape(h2, dims.wp, 16)
        q = jnp.broadcast_to(q[:, None, :, :], (h2, 2, dims.wp, 16))
        q = q.reshape(dims.p, 16) * (1.0 / 255.0)
    else:
        q = quad_flat[idx].astype(jnp.float32) * (1.0 / 255.0)
    wx = fx[:, None]
    wy = fy[:, None]
    texel = (
        q[:, 0:3] * (1 - wx) * (1 - wy) + q[:, 4:7] * wx * (1 - wy)
        + q[:, 8:11] * (1 - wx) * wy + q[:, 12:15] * wx * wy
    )
    return jnp.where(valid[:, None], texel, 1.0)


def _mip_args(cfg: EngineConfig, model: ModelArrays) -> tuple[bool, tuple]:
    """(use_mips, per-layer lod bias) for the shade kernels; a half-res
    fetched layer samples one level coarser so the 2x2-replicated result
    matches full-res sampling of the prefiltered chain."""
    use = cfg.albedo_mips and model.atlas.mip_base is not None
    if not use:
        return False, (0.0, 0.0)
    return True, (1.0 if cfg.albedo_half_occluded else 0.0,
                  1.0 if cfg.albedo_half_visible else 0.0)


def _albedo_u32(atlas_u8, o, base, dims, *, half_res: bool) -> jax.Array:
    """Texel index channels -> (hp, wp) i32 packed texels (one gather per
    pixel; byte unpack happens in the composite kernel).

    The gather runs against the (N, 4) u8 atlas rows — measured ~20%
    faster per index than a scalar-u32 gather (scripts/mb_gather.py) —
    and bitcasts the result to i32 (free, layout-compatible).
    Mirrors _fetch_albedo's nearest path: idx = tex + (fx>.5)dx + (fy>.5)dy;
    half_res gathers every other pixel and replicates 2x2.
    """
    tex = o[base + ST.O_TEX]
    dxdy = o[base + ST.O_DXDY]
    fx = o[base + ST.O_FX]
    fy = o[base + ST.O_FY]
    dx = jnp.mod(dxdy, 2.0)
    dy = (dxdy - dx) * 0.5
    near = tex + jnp.where(fx > 0.5, dx, 0.0) + jnp.where(fy > 0.5, dy, 0.0)
    idx = jnp.maximum(near, 0.0).astype(jnp.int32)

    def g32(i):
        return jax.lax.bitcast_convert_type(atlas_u8[i], jnp.int32)

    if half_res:
        h2, w2 = dims.hp // 2, dims.wp // 2
        i2 = idx.reshape(h2, 2, dims.wp)[:, 0, :]
        i4 = i2[:, ::2]
        tx = g32(i4)  # (h2, w2) i32
        tx = jnp.broadcast_to(tx[:, :, None], (h2, w2, 2)).reshape(h2, dims.wp)
        tx = jnp.broadcast_to(tx[:, None, :], (h2, 2, dims.wp))
        return tx.reshape(dims.hp, dims.wp)
    return g32(idx).reshape(dims.hp, dims.wp)


def _albedo_quad32(quad_u8, o, base, dims, *, half_res: bool) -> jax.Array:
    """Texel index channels -> (4, hp, wp) i32 quad footprints: ONE gather
    of the 16-byte quad row per pixel (bitcast to 4 packed texels); the
    composite kernel lerps with the per-pixel (fx, fy) channels. Same
    per-index gather price as the nearest path for true bilinear output."""
    tex = o[base + ST.O_TEX]
    idx = jnp.maximum(tex, 0.0).astype(jnp.int32)

    def g(i):
        q = quad_u8[i]  # (..., 16) u8
        return jax.lax.bitcast_convert_type(
            q.reshape(q.shape[:-1] + (4, 4)), jnp.int32)  # (..., 4) i32

    if half_res:
        h2, w2 = dims.hp // 2, dims.wp // 2
        i2 = idx.reshape(h2, 2, dims.wp)[:, 0, :]
        i4 = i2[:, ::2]
        q = g(i4)  # (h2, w2, 4) i32
        q = jnp.broadcast_to(q[:, :, None, :], (h2, w2, 2, 4))
        q = q.reshape(h2, dims.wp, 4)
        q = jnp.broadcast_to(q[:, None, :, :], (h2, 2, dims.wp, 4))
        q = q.reshape(dims.hp, dims.wp, 4)
    else:
        q = g(idx).reshape(dims.hp, dims.wp, 4)
    return q.transpose(2, 0, 1)


def _composite_shaded_kernel(o, atlas_flat, dims, cfg, interpret=False,
                             quad=None):
    """Pallas epilogue route (kernels/composite_tpu.py): u32 albedo gathers
    + in-VMEM composite/bloom-extract; blur + upsample + add in XLA.
    Nearest mode gathers one texel per pixel; bilinear mode one quad
    footprint per pixel (same index count) when the quad atlas is built."""
    from ..kernels import composite_tpu as CT

    op = o.reshape(2 * ST.O_CH, dims.hp, dims.wp)
    if cfg.albedo_bilinear and quad is not None:
        a0 = _albedo_quad32(quad, o, 0, dims,
                            half_res=cfg.albedo_half_occluded)
        a1 = _albedo_quad32(quad, o, ST.O_CH, dims,
                            half_res=cfg.albedo_half_visible)
    else:
        a0 = _albedo_u32(atlas_flat, o, 0, dims,
                         half_res=cfg.albedo_half_occluded)
        a1 = _albedo_u32(atlas_flat, o, ST.O_CH, dims,
                         half_res=cfg.albedo_half_visible)
    img_cf, half = CT.composite_tpu(
        op, a0, a1, with_bloom=cfg.enable_bloom, interpret=interpret,
    )
    img_cf = img_cf[:, : dims.height, : dims.width]
    if cfg.enable_bloom:
        # finish the 2x2 box (kernel did the vertical half), then the
        # reference extract -> blur -> upsample -> add chain
        vm = half[:, : dims.height // 2, : dims.width]
        hm = vm.reshape(3, dims.height // 2, dims.width // 2, 2).mean(-1)
        bloom = post.extract(hm, cfg.bloom_threshold)
        bloom = post._blur_axis(post._blur_axis(bloom, 2), 1)
        up = post._up2_axis_cf(post._up2_axis_cf(bloom, 1), 2)
        img_cf = img_cf + up * cfg.bloom_intensity
    return jnp.clip(img_cf, 0.0, 1.0).transpose(1, 2, 0)


def _finish_frame_crowd(o, atlas_flat, dims, cfg, interpret=False, quad=None):
    """Crowd composite: o (C, 2*O_CH, P) -> (C, H, W, 3). Nearest mode runs
    the batched Pallas epilogue; bilinear vmaps the XLA composite."""
    if cfg.albedo_bilinear and quad is None:
        return jax.vmap(
            lambda o1: _composite_shaded(o1, atlas_flat, dims, cfg))(o)
    from ..kernels import composite_tpu as CT

    c_dim = o.shape[0]
    op = o.reshape(c_dim, 2 * ST.O_CH, dims.hp, dims.wp)
    if cfg.albedo_bilinear:
        a0 = jax.vmap(lambda o1: _albedo_quad32(
            quad, o1, 0, dims, half_res=cfg.albedo_half_occluded))(o)
        a1 = jax.vmap(lambda o1: _albedo_quad32(
            quad, o1, ST.O_CH, dims, half_res=cfg.albedo_half_visible))(o)
    else:
        a0 = jax.vmap(lambda o1: _albedo_u32(
            atlas_flat, o1, 0, dims, half_res=cfg.albedo_half_occluded))(o)
        a1 = jax.vmap(lambda o1: _albedo_u32(
            atlas_flat, o1, ST.O_CH, dims,
            half_res=cfg.albedo_half_visible))(o)
    img_cf, half = CT.composite_tpu(
        op, a0, a1, with_bloom=cfg.enable_bloom, interpret=interpret,
    )
    img_cf = img_cf[:, :, : dims.height, : dims.width]
    if cfg.enable_bloom:
        vm = half[:, :, : dims.height // 2, : dims.width]
        hm = vm.reshape(c_dim, 3, dims.height // 2, dims.width // 2,
                        2).mean(-1)
        bloom = post.extract(hm, cfg.bloom_threshold)
        bloom = post._blur_axis(post._blur_axis(bloom, 3), 2)
        up = post._up2_axis_cf(post._up2_axis_cf(bloom, 2), 3)
        img_cf = img_cf + up * cfg.bloom_intensity
    return jnp.clip(img_cf, 0.0, 1.0).transpose(0, 2, 3, 1)


def _finish_frame(o, atlas_flat, dims, cfg, interpret=False, quad=None):
    """Composite route: Pallas epilogue for nearest albedo and for
    quad-packed bilinear (ONE gather per pixel either way); the XLA
    composite only for 4-tap bilinear without a quad atlas."""
    if not cfg.albedo_bilinear or quad is not None:
        return _composite_shaded_kernel(o, atlas_flat, dims, cfg, interpret,
                                        quad=quad)
    return _composite_shaded(o, atlas_flat, dims, cfg, quad=quad)


def _composite_shaded(o, atlas_flat, dims, cfg, quad=None):
    """Shade-kernel outputs (2*O_CH, P) -> (H, W, 3) with albedo + bloom."""
    cr = cg = cb = jnp.zeros((dims.p,))
    for layer in range(2):
        base = layer * ST.O_CH
        half = (cfg.albedo_half_occluded and layer == 0) or (
            cfg.albedo_half_visible and layer == 1)
        if cfg.albedo_bilinear and quad is not None:
            albedo = _fetch_albedo_quad(quad, o, base, dims, half_res=half)
        else:
            albedo = _fetch_albedo(
                atlas_flat, o, base, dims,
                bilinear=cfg.albedo_bilinear, half_res=half,
            )
        rim = o[base + ST.O_RIM]
        a = o[base + ST.O_AEFF]
        na = 1.0 - a
        cr = (albedo[:, 0] * o[base + ST.O_LR] + rim) * a + cr * na
        cg = (albedo[:, 1] * o[base + ST.O_LG] + rim) * a + cg * na
        cb = (albedo[:, 2] * o[base + ST.O_LB] + rim) * a + cb * na
    img_cf = jnp.stack([cr, cg, cb]).reshape(3, dims.hp, dims.wp)
    img_cf = img_cf[:, : dims.height, : dims.width]
    if cfg.enable_bloom:
        img_cf = post.apply_bloom_cf(
            img_cf, cfg.bloom_threshold, cfg.bloom_intensity
        )
    return jnp.clip(img_cf, 0.0, 1.0).transpose(1, 2, 0)


_PASS_SPECS = (
    (CLASS_OPAQUE, raster.CULL_NONE, False),
    (CLASS_EYE, raster.CULL_FRONT, False),
    (CLASS_OPAQUE, raster.CULL_BACK, True),
    (CLASS_HAIR, raster.CULL_FRONT, False),
    (CLASS_HAIR, raster.CULL_BACK, True),
    (CLASS_TRANSPARENT, raster.CULL_NONE, False),
    (CLASS_TRANSPARENT, raster.CULL_BACK, True),
)


def _build_group_tables(model, cfg, dims, tables, pos, nrm, view_proj, uvs,
                        with_quad=False):
    """Per-pass triangle setup + pair rows -> FrameTables for the grouped
    megakernel (kernels/frame_tpu.py). Pure XLA, so crowds can jax.vmap it
    over a leading character axis and feed the batched kernel. All 7
    passes merge under ONE sort + ONE row gather (FT.pack_frame_rows)."""
    from ..kernels import frame_tpu as FT

    parts = []
    for cls, cull, outline in _PASS_SPECS:
        data = _gather_pass(model, pos, nrm, view_proj, cls, outline,
                            cfg.outline_scale, uvs)
        t = data.valid.shape[0]
        assert t < (1 << 15), f"pass has {t} triangles (>= 2^15)"
        tri = raster.setup_triangles(
            data.corners_clip, data.valid, dims.wp, dims.hp, cull
        )
        cols = tables.push_tab[jnp.maximum(data.tri_mat, 0)]  # (T, 7)
        alpha = cols[:, 1] if outline else cols[:, 0]
        cap = -(-int(t * cfg.pair_cap_scale + 1024) // FT.CHUNK) * FT.CHUNK
        parts.append(FT.pack_pass_part(
            tri, data.corner_uv, data.corner_nrm, alpha, cols[:, 2],
            cols[:, 4], cols[:, 5], cols[:, 6],
            dims.hp // FT.TILE_H, dims.wp // FT.TILE_W, cap,
            with_attrs=not outline,
        ))
    ft = FT.pack_frame_rows(parts, dims.hp // FT.TILE_H,
                            dims.wp // FT.TILE_W)
    if with_quad:
        # (8, 4 * N) plane-coefficient table: window wi occupies lanes
        # [512 wi, 512 (wi+1)) as [e0 | e1 | e2 | z] blocks of 128 pairs,
        # rows [a; b; c; 0...] — one (1024, 8) @ (8, 512) matmul per sample
        # evaluates every plane of a chunk (mxu rasterizer only)
        n = ft.rows.shape[0]
        q = ft.rows[:, :12].reshape(n // FT.CHUNK, FT.CHUNK, 4, 3)
        q = q.transpose(3, 0, 2, 1).reshape(3, n * 4)
        ft = ft._replace(rows_t=jnp.concatenate(
            [q, jnp.zeros((5, n * 4))], axis=0))
    return ft


def _build_stream_tables(model, cfg, dims, tables, pos, nrm, view_proj, uvs):
    """Per-pass triangle setup + pair enumeration -> merged StreamTables.

    Pure XLA (sorts/gathers only), so crowds can jax.vmap it over a leading
    character axis and feed the batched megakernel in one launch.
    """
    from ..kernels import frame_stream as FS

    tabs, bins = [], []
    for cls, cull, outline in _PASS_SPECS:
        data = _gather_pass(model, pos, nrm, view_proj, cls, outline,
                            cfg.outline_scale, uvs)
        t = data.valid.shape[0]
        assert t < (1 << 15), f"pass has {t} triangles (>= 2^15)"
        tri = raster.setup_triangles(
            data.corners_clip, data.valid, dims.wp, dims.hp, cull
        )
        cols = tables.push_tab[jnp.maximum(data.tri_mat, 0)]
        alpha = cols[:, 1] if outline else cols[:, 0]
        cap = -(-int(t * cfg.pair_cap_scale + 1024) // FS.CHUNK) * FS.CHUNK
        tab, binfo = FS.build_pass_rows(
            tri, data.corner_uv, data.corner_nrm, alpha, cols[:, 2],
            cols[:, 4], cols[:, 5], cols[:, 6],
            dims.hp // FS.TILE_H, dims.wp // FS.TILE_W, cap,
            with_attrs=not outline,
        )
        tabs.append(tab)
        bins.append(binfo)
    return FS.pack_stream(tabs, bins, dims.hp // FS.TILE_H,
                          dims.wp // FS.TILE_W)


def render_frame_mega(
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
    uvs: jax.Array | None = None,
    mat_mod: tuple | None = None,
    shade_tables: "ST.ShadeTables | None" = None,
    with_diag: bool = False,
) -> jax.Array:
    """Whole-frame megakernel path (kernels/frame_tpu.py): all 7 passes +
    layer stack + lighting in one pallas_call; albedo + composite + bloom
    in XLA. With ``with_diag`` returns (frame, pair_overflow)."""
    from ..kernels import frame_tpu as FT

    inv_vp = m3.mat4_inverse(view_proj)
    tables = (shade_tables if shade_tables is not None
              else ST.pack_shade_tables(model.materials, model.atlas))
    if mat_mod is not None:
        a_scale, a_add, e_scale, e_add = mat_mod
        tab = tables.push_tab
        tab = tab.at[:, 0].set(jnp.clip(tab[:, 0] * a_scale + a_add, 0.0, 1.0))
        tab = tab.at[:, 1].set(jnp.clip(tab[:, 1] * e_scale + e_add, 0.0, 1.0))
        tables = tables._replace(push_tab=tab)

    if cfg.rasterizer == "stream":
        # merged-stream megakernel (kernels/frame_stream.py): ONE pair walk
        # per tile covering all 7 passes
        from ..kernels import frame_stream as FS

        st = _build_stream_tables(model, cfg, dims, tables, pos, nrm,
                                  view_proj, uvs)
        raw = FS.render_megakernel_stream(
            st, hp=dims.hp, wp=dims.wp, n_samples=cfg.msaa_samples,
            interpret=interpret,
        )
        stack = FS.compose_stream_state(
            raw, dims.hp, dims.wp, cfg.msaa_samples
        )
        use_mips, lod_bias = _mip_args(cfg, model)
        shaded = ST.shade_stack_tpu(
            stack, tables, lights, None, cfg.rim_light_intensity, eye_pos,
            inv_vp, interpret=interpret, use_mips=use_mips, lod_bias=lod_bias,
        )
        o = shaded.reshape(2 * ST.O_CH, dims.p)
        flat = model.atlas.mip_flat if use_mips else packed.atlas_flat
        quad = model.atlas.mip_quad if use_mips else model.atlas.flat_quad
        img = _finish_frame(o, flat, dims, cfg, interpret, quad=quad)
        return (img, st.overflow) if with_diag else img
    ft = _build_group_tables(model, cfg, dims, tables, pos, nrm, view_proj,
                             uvs, with_quad=cfg.rasterizer == "mxu")
    use_mips, lod_bias = _mip_args(cfg, model)
    if cfg.rasterizer == "mxu":
        from ..kernels import frame_mxu as FM

        stack_pm = FM.render_megakernel_mxu(
            ft, hp=dims.hp, wp=dims.wp, n_samples=cfg.msaa_samples,
            interpret=interpret,
        )  # (B*1024, 2*L_CH) pixel-major, tile-major
        fby = dims.hp // FM.TILE_H
        fbx = dims.wp // FM.TILE_W
        stack = stack_pm.reshape(
            fby, fbx, FM.TILE_H, FM.TILE_W, 2 * ST.L_CH
        ).transpose(4, 0, 2, 1, 3).reshape(2 * ST.L_CH, dims.hp, dims.wp)
        shaded = ST.shade_stack_tpu(
            stack, tables, lights, None, cfg.rim_light_intensity, eye_pos,
            inv_vp, interpret=interpret, use_mips=use_mips, lod_bias=lod_bias,
        )
    else:
        analytic = cfg.msaa_mode == "analytic"
        mega = FT.render_megakernel
        if cfg.rasterizer == "hybrid":
            from ..kernels import frame_hybrid as FH

            mega = FH.render_megakernel_hybrid
        shaded = mega(
            ft, tables, lights, cfg.rim_light_intensity, eye_pos, inv_vp,
            hp=dims.hp, wp=dims.wp,
            n_samples=1 if analytic else cfg.msaa_samples,
            interpret=interpret, use_mips=use_mips, lod_bias=lod_bias,
            analytic=analytic,
        )
    o = shaded.reshape(2 * ST.O_CH, dims.p)
    flat = model.atlas.mip_flat if use_mips else packed.atlas_flat
    quad = model.atlas.mip_quad if use_mips else model.atlas.flat_quad
    img = _finish_frame(o, flat, dims, cfg, interpret, quad=quad)
    return (img, ft.overflow) if with_diag else img


def render_crowd_mega(
    model: ModelArrays,
    cfg: EngineConfig,
    dims: FastDims,
    packed: SF.PackedMaterials,
    pos: jax.Array,        # (C, V, 3)
    nrm: jax.Array,        # (C, V, 3)
    view_proj: jax.Array,  # (C, 4, 4)
    eye_pos: jax.Array,    # (C, 3)
    lights: Lights,
    interpret: bool = False,
    uvs: jax.Array | None = None,       # (C, V, 2) or None
    mat_mod: tuple | None = None,       # per-char factors or None
    shade_tables: "ST.ShadeTables | None" = None,
    with_diag: bool = False,
) -> jax.Array:
    """Crowd frame: C characters rendered by ONE batched megakernel launch.

    The table build (pure XLA) is vmapped over the character axis and the
    megakernel takes character as a leading grid dimension — the grouped
    kernel (kernels/frame_tpu.py, default) rasterizes AND shades the whole
    crowd in one pallas_call; rasterizer="stream" routes through the
    merged-stream kernel + batched shade instead. The composite epilogue
    runs batched too (kernels/composite_tpu.py). Replaces the per-chip
    sequential lax.map of whole frames (BASELINE config #5; the reference
    renders one character per page, engine.ts:2123-2243).
    -> (C, H, W, 3), plus per-character pair overflow with ``with_diag``.
    """
    from ..kernels import frame_tpu as FT

    tables = (shade_tables if shade_tables is not None
              else ST.pack_shade_tables(model.materials, model.atlas))
    c_dim = pos.shape[0]
    use_stream = cfg.rasterizer == "stream"
    use_mips, lod_bias = _mip_args(cfg, model)
    inv_vp = jax.vmap(m3.mat4_inverse)(view_proj)

    def build(pos1, nrm1, vp1, uvs1, mm1):
        tab = tables
        if mm1 is not None:
            a_scale, a_add, e_scale, e_add = mm1
            pt = tab.push_tab
            pt = pt.at[:, 0].set(jnp.clip(pt[:, 0] * a_scale + a_add, 0.0, 1.0))
            pt = pt.at[:, 1].set(jnp.clip(pt[:, 1] * e_scale + e_add, 0.0, 1.0))
            tab = tab._replace(push_tab=pt)
        if use_stream:
            return _build_stream_tables(model, cfg, dims, tab, pos1, nrm1,
                                        vp1, uvs1)
        return _build_group_tables(model, cfg, dims, tab, pos1, nrm1, vp1,
                                   uvs1)

    in_axes = (0, 0, 0,
               0 if uvs is not None else None,
               0 if mat_mod is not None else None)
    st = jax.vmap(build, in_axes=in_axes)(pos, nrm, view_proj, uvs, mat_mod)

    if use_stream:
        from ..kernels import frame_stream as FS

        raw = FS.render_megakernel_stream(
            st, hp=dims.hp, wp=dims.wp, n_samples=cfg.msaa_samples,
            interpret=interpret,
        )  # (C * B * 1024, S_OUT)
        raw = raw.reshape(c_dim, dims.p, FS.S_OUT)
        stack = jax.vmap(
            lambda r: FS.compose_stream_state(r, dims.hp, dims.wp,
                                              cfg.msaa_samples)
        )(raw)  # (C, 2*L_CH, hp, wp)
        shaded = ST.shade_stack_tpu(
            stack, tables, lights, None, cfg.rim_light_intensity, eye_pos,
            inv_vp, interpret=interpret, use_mips=use_mips,
            lod_bias=lod_bias,
        )  # (C, 2*O_CH, hp, wp)
    else:
        analytic = cfg.msaa_mode == "analytic"
        mega = FT.render_megakernel
        if cfg.rasterizer == "hybrid":
            from ..kernels import frame_hybrid as FH

            mega = FH.render_megakernel_hybrid
        shaded = mega(
            st, tables, lights, cfg.rim_light_intensity, eye_pos, inv_vp,
            hp=dims.hp, wp=dims.wp,
            n_samples=1 if analytic else cfg.msaa_samples,
            interpret=interpret, use_mips=use_mips, lod_bias=lod_bias,
            analytic=analytic,
        )  # (C, 2*O_CH, hp, wp)
    o = shaded.reshape(c_dim, 2 * ST.O_CH, dims.p)
    flat = model.atlas.mip_flat if use_mips else packed.atlas_flat
    quad = model.atlas.mip_quad if use_mips else model.atlas.flat_quad
    img = _finish_frame_crowd(o, flat, dims, cfg, interpret, quad=quad)
    return (img, st.overflow) if with_diag else img  # overflow: (C,)


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
    """(N_CH, HP, WP) planar -> (N_CH, P) — a free reshape."""
    return gbuf.reshape(RT.N_CH, dims.p)


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
    uvs: jax.Array | None = None,
    mat_mod: tuple | None = None,
    shade_tables: "ST.ShadeTables | None" = None,
    with_diag: bool = False,
) -> jax.Array:
    atlas_stride = model.atlas.texels.shape[2]
    overflow = jnp.int32(0)
    inv_vp = m3.mat4_inverse(view_proj)
    samples = cfg.msaa_samples

    zbuf = jnp.full((samples, dims.hp, dims.wp), 1.0)
    color = jnp.zeros((dims.p, 3))
    stencil = jnp.zeros((dims.p,), jnp.int32)

    def run_raster(cls, cull, outline, depth_write):
        """Rasterize one pass, slicing it if it exceeds the per-call triangle
        limit; slice G-buffers merge with last-writer-wins + summed cover."""
        data = _gather_pass(model, pos, nrm, view_proj, cls, outline,
                            cfg.outline_scale, uvs)
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
            nonlocal overflow
            overflow = overflow + tabs.overflow
            zb, gbuf = RT.raster_pass_tpu(
                tabs, zb, bx=dims.bx, depth_write=depth_write,
                with_attrs=not outline, interpret=interpret,
            )
            if merged is None:
                merged = gbuf
            else:
                won = gbuf[RT.CH_MAT : RT.CH_MAT + 1] >= 0
                cover = jnp.minimum(
                    merged[RT.CH_COVER] + gbuf[RT.CH_COVER], 1.0
                )
                merged = jnp.where(won, gbuf, merged)
                merged = merged.at[RT.CH_COVER].set(cover)
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
        # order), push fragments onto a 2-deep layer stack (lean XLA selects
        # in planar layout), then shade ONCE in a Pallas kernel
        # (kernels/shade_tpu.py) + per-layer albedo gathers + composite.
        tables = (shade_tables if shade_tables is not None
                  else ST.pack_shade_tables(model.materials, model.atlas))
        if mat_mod is not None:
            # material-morph alpha/edge-alpha factors (PMX kind 8):
            # value' = clip(value * (1 + w*dmul) + w*add, 0, 1)
            a_scale, a_add, e_scale, e_add = mat_mod
            tab = tables.push_tab
            tab = tab.at[:, 0].set(jnp.clip(tab[:, 0] * a_scale + a_add, 0.0, 1.0))
            tab = tab.at[:, 1].set(jnp.clip(tab[:, 1] * e_scale + e_add, 0.0, 1.0))
            tables = tables._replace(push_tab=tab)
        stack = jnp.zeros((2 * ST.L_CH, dims.hp, dims.wp))
        stencil = jnp.zeros((dims.p,), bool)

        def push(stack, stencil, gbuf, outline, use_stencil=False,
                 write_stencil=False):
            g = gbuf.reshape(RT.N_CH, dims.p)
            mat = g[RT.CH_MAT]
            cover = g[RT.CH_COVER]
            m = tables.push_tab.shape[0]
            onehot = (
                jnp.maximum(mat, 0.0)[:, None]
                == jnp.arange(m, dtype=jnp.float32)[None, :]
            ).astype(jnp.float32)
            cols = onehot @ tables.push_tab  # (P, 7)
            a = cols[:, 1] if outline else cols[:, 0]
            if use_stencil:
                a = a * jnp.where(stencil & (cols[:, 2] > 0.5), 0.5, 1.0)
            a_eff = a * cover
            present = (mat >= 0.0) & (a_eff >= 0.001)
            a_eff = jnp.where(present, a_eff, 0.0)
            opaque = present & (a_eff > 0.999)
            translucent = present & ~opaque

            frag = jnp.stack([
                g[RT.CH_UIW], g[RT.CH_VIW], g[RT.CH_NXIW], g[RT.CH_NYIW],
                g[RT.CH_NZIW], g[RT.CH_IW], g[RT.CH_Z], a_eff,
                jnp.full(dims.p, 1.0 if outline else 0.0),
                cols[:, 4], cols[:, 5], cols[:, 6],
            ])  # (L_CH, P)
            st = stack.reshape(2 * ST.L_CH, dims.p)
            l0, l1 = st[: ST.L_CH], st[ST.L_CH:]
            l1_present = l1[ST.L_AEFF] > 0.0
            new_l0 = jnp.where(
                opaque, 0.0, jnp.where(translucent & l1_present, l1, l0)
            )
            new_l1 = jnp.where(present, frag, l1)
            new_stack = jnp.concatenate([new_l0, new_l1]).reshape(stack.shape)
            if write_stencil:
                stencil = stencil | ((mat >= 0) & (cover > 0))
            return new_stack, stencil

        zbuf, gbuf = run_raster(CLASS_OPAQUE, raster.CULL_NONE, False, True)
        stack, stencil = push(stack, stencil, gbuf, False)
        zbuf, gbuf = run_raster(CLASS_EYE, raster.CULL_FRONT, False, True)
        stack, stencil = push(stack, stencil, gbuf, False, write_stencil=True)
        zbuf, gbuf = run_raster(CLASS_OPAQUE, raster.CULL_BACK, True, True)
        stack, stencil = push(stack, stencil, gbuf, True)
        zbuf, gbuf = run_raster(CLASS_HAIR, raster.CULL_FRONT, False, True)
        stack, stencil = push(stack, stencil, gbuf, False, use_stencil=True)
        zbuf, gbuf = run_raster(CLASS_HAIR, raster.CULL_BACK, True, False)
        stack, stencil = push(stack, stencil, gbuf, True)
        zbuf, gbuf = run_raster(CLASS_TRANSPARENT, raster.CULL_NONE, False, True)
        stack, stencil = push(stack, stencil, gbuf, False)
        zbuf, gbuf = run_raster(CLASS_TRANSPARENT, raster.CULL_BACK, True, True)
        stack, stencil = push(stack, stencil, gbuf, True)

        use_mips, lod_bias = _mip_args(cfg, model)
        shaded = ST.shade_stack_tpu(
            stack, tables, lights, None, cfg.rim_light_intensity, eye_pos,
            inv_vp, interpret=interpret, use_mips=use_mips, lod_bias=lod_bias,
        )
        o = shaded.reshape(2 * ST.O_CH, dims.p)
        flat = model.atlas.mip_flat if use_mips else packed.atlas_flat
        quad = model.atlas.mip_quad if use_mips else model.atlas.flat_quad
        img = _finish_frame(o, flat, dims, cfg, interpret, quad=quad)
        return (img, overflow) if with_diag else img
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
    img = jnp.clip(img, 0.0, 1.0)
    return (img, overflow) if with_diag else img
