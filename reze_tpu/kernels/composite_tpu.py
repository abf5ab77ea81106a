"""Pallas composite epilogue: albedo modulate + 2-layer blend + bloom
extract, per-tile in VMEM.

The XLA composite (render/pipeline_tpu._composite_shaded) reads the shade
kernel's 18 planar channels plus two gathered albedo buffers and runs ~20
elementwise stages plus the bloom chain; measured 8.2 ms of the 39 ms 1080p
frame (scripts/profile_albedo.py) against ~0.3 ms of theoretical HBM
traffic — XLA materializes several intermediates and the bloom stages do
not fuse. This kernel does the whole epilogue in one VMEM pass:

  * albedo arrives as ONE u32 texel per pixel per layer (the caller
    gathers ``atlas32[idx]`` — a scalar-u32 gather instead of the (N, 4)
    u8 row gather; byte unpack happens in-kernel on the VPU);
  * the two layers composite back-to-front with their effective alphas
    (reference blend: engine.ts:364-376);
  * the bloom seed's VERTICAL 2x box mean emits a second output at
    (3, hp/2, wp) — the horizontal mean + threshold extract
    (engine.ts:1018-1023) and the 5-tap blur + upsample + add stay in XLA
    (measured ~0.02 ms standalone, scripts/mb_bloom.py).

Outputs: composite (3, hp, wp) + bloom vertical-mean seed (3, hp/2, wp).
Albedo modes: nearest (one i32 texel per pixel) and quad-packed bilinear
(4 i32 channels per pixel = the 2x2 footprint from one 16-byte gather,
lerped in-kernel with the shade kernel's fx/fy). Only 4-tap bilinear
without a quad atlas keeps the XLA path (_composite_shaded).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import shade_tpu as ST

TILE_H = 32
TILE_W = 128

_INV255 = 1.0 / 255.0


def _unpack_rgb(u):
    """(H, W) i32 packed texel -> three f32 planes (atlas rows are
    [r, g, b, a] u8; little-endian bitcast puts r in the low byte)."""
    r = (u & 255).astype(jnp.float32) * _INV255
    g = ((u >> 8) & 255).astype(jnp.float32) * _INV255
    b = ((u >> 16) & 255).astype(jnp.float32) * _INV255
    return r, g, b


def _composite_kernel(o_ref, a0_ref, a1_ref, out_ref, half_ref, *,
                      with_bloom: bool, batched: bool = False,
                      quad: bool = False):
    if batched:
        # grid (C, by, bx): all refs are per-character blocks
        o_ref = o_ref.at[0]
        a0_ref = a0_ref.at[0]
        a1_ref = a1_ref.at[0]
        out_ref = out_ref.at[0]
        half_ref = half_ref.at[0]
    cr = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    cg = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    cb = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    for layer, a_ref in ((0, a0_ref), (1, a1_ref)):
        base = layer * ST.O_CH
        if quad:
            # bilinear from the quad-packed footprint: the 4 texels of the
            # 2x2 neighborhood ride the albedo ref as 4 i32 channels
            # (core/build.py build_quad_chain); lerp weights are the shade
            # kernel's per-pixel (fx, fy)
            fx = o_ref[base + ST.O_FX]
            fy = o_ref[base + ST.O_FY]
            ws = ((1.0 - fx) * (1.0 - fy), fx * (1.0 - fy),
                  (1.0 - fx) * fy, fx * fy)
            tr = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            tg = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            tb = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            for qi in range(4):
                r, g, b = _unpack_rgb(a_ref[qi])
                tr = tr + r * ws[qi]
                tg = tg + g * ws[qi]
                tb = tb + b * ws[qi]
        else:
            tr, tg, tb = _unpack_rgb(a_ref[0])
        valid = o_ref[base + ST.O_TEX] >= 0.0
        tr = jnp.where(valid, tr, 1.0)
        tg = jnp.where(valid, tg, 1.0)
        tb = jnp.where(valid, tb, 1.0)
        rim = o_ref[base + ST.O_RIM]
        a = o_ref[base + ST.O_AEFF]
        na = 1.0 - a
        cr = (tr * o_ref[base + ST.O_LR] + rim) * a + cr * na
        cg = (tg * o_ref[base + ST.O_LG] + rim) * a + cg * na
        cb = (tb * o_ref[base + ST.O_LB] + rim) * a + cb * na
    out_ref[0] = cr
    out_ref[1] = cg
    out_ref[2] = cb
    if with_bloom:
        # vertical 2x box only (a (·, TILE_W/2) block would break the
        # 128-lane tiling rule); the caller finishes the horizontal mean +
        # threshold extract in XLA so down->extract order is exact
        for c, plane in enumerate((cr, cg, cb)):
            half = plane.reshape(TILE_H // 2, 2, TILE_W)
            half_ref[c] = (half[:, 0, :] + half[:, 1, :]) * 0.5


def composite_tpu(
    o: jax.Array,    # (2*O_CH, hp, wp) shade kernel output
    a0: jax.Array,   # (hp, wp) i32 packed texels, occluded layer
    a1: jax.Array,   # (hp, wp) i32 packed texels, visible layer
    *,
    with_bloom: bool,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array | None]:
    """-> (composite (3, hp, wp), bloom vertical mean (3, hp//2, wp) | None).

    A 4-D ``o`` (C, 2*O_CH, hp, wp) with (C, hp, wp) albedo planes runs the
    whole crowd in one launch; outputs gain a leading C axis.
    """
    batched = o.ndim == 4
    hp, wp = o.shape[-2:]
    c_dim = o.shape[0] if batched else 1
    # (hp, wp) i32 albedo = nearest; (4, hp, wp) = quad-packed bilinear
    quad = a0.ndim == (4 if batched else 3)
    n_ch = 4 if quad else 1
    kernel = functools.partial(_composite_kernel, with_bloom=with_bloom,
                               batched=batched, quad=quad)
    if batched:
        grid = (c_dim, hp // TILE_H, wp // TILE_W)
        in_specs = [
            pl.BlockSpec((1, 2 * ST.O_CH, TILE_H, TILE_W),
                         lambda c, i, j: (c, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_ch, TILE_H, TILE_W),
                         lambda c, i, j: (c, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_ch, TILE_H, TILE_W),
                         lambda c, i, j: (c, 0, i, j),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = [
            pl.BlockSpec((1, 3, TILE_H, TILE_W), lambda c, i, j: (c, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TILE_H // 2, TILE_W),
                         lambda c, i, j: (c, 0, i, j),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((c_dim, 3, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((c_dim, 3, hp // 2, wp), jnp.float32),
        ]
        dims_sem = ("parallel", "parallel", "parallel")
        args = (o, a0 if quad else a0[:, None], a1 if quad else a1[:, None])
    else:
        grid = (hp // TILE_H, wp // TILE_W)
        in_specs = [
            pl.BlockSpec((2 * ST.O_CH, TILE_H, TILE_W),
                         lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ch, TILE_H, TILE_W), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ch, TILE_H, TILE_W), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = [
            pl.BlockSpec((3, TILE_H, TILE_W), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_H // 2, TILE_W),
                         lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((3, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((3, hp // 2, wp), jnp.float32),
        ]
        dims_sem = ("parallel", "parallel")
        args = (o, a0 if quad else a0[None], a1 if quad else a1[None])
    out, half = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dims_sem,
        ),
        interpret=interpret,
    )(*args)
    return out, (half if with_bloom else None)
