"""Pallas deferred-shading kernel: toon lighting entirely in VMEM.

The XLA shading path (render/shading_fast.py) is HBM-bound at 1080p: every
intermediate is a (2M,) array round-tripped through HBM (~0.08 ms/pass,
dozens of passes, ~6 ms/frame before the albedo gather). This kernel does the
whole lighting computation per (32, 128) tile in VMEM:

  * per-pixel material properties come from tiny *deduplicated* group tables
    (the reference content has 2 distinct toon ramps, 5 textures and 3 edge
    colors across its 19-24 materials) selected by group-id channels the
    push stage stores in the layer stack — a handful of vector selects
    instead of a 19-material x 34-column ladder;
  * toon ramp = 9-knot linear B-spline in hat basis (no branch ladder);
  * world position from depth + inverse view-projection;
  * rim term (1 - n.v)^2 (engine.ts:303-306);
  * per-tile empty-layer skip: a tile whose layer has no covered pixel
    writes zeros and does no lighting math (typical frames cover 10-30% of
    tiles in layer 1 and ~3% in layer 0).

The one thing it cannot do is the albedo texture fetch (random HBM access).
It emits per-layer texel indices (+ bilinear footprint); the caller gathers
albedo in XLA and composites (render/pipeline_tpu.py). Reference semantics:
toon fragment shader in engine.ts:197-312.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import Lights, Materials, TextureAtlas

TILE_H = 32
TILE_W = 128

N_KNOTS = 9

# layer-stack channels (per layer)
(L_UIW, L_VIW, L_NXIW, L_NYIW, L_NZIW, L_IW, L_Z, L_AEFF, L_OUT,
 L_RAMP, L_TEX, L_EDGE) = range(12)
L_CH = 12

# kernel outputs (per layer): lit rgb, rim, nearest texidx, bilinear footprint
O_LR, O_LG, O_LB, O_RIM, O_TEX, O_DXDY, O_FX, O_FY, O_AEFF = range(9)
O_CH = 9


class ShadeTables(NamedTuple):
    """Deduplicated per-group property tables + per-material push columns.

    push_tab columns: [alpha, edge_alpha, is_hair, is_eye, ramp_gid,
    tex_gid, edge_gid]
    """

    push_tab: jax.Array  # (M, 7)
    knot_tab: jax.Array  # (Kr, 27) toon ramp knots rgb
    tex_tab: jax.Array  # (Kt, 4) [h, w, base, valid]
    edge_tab: jax.Array  # (Ke, 3) edge rgb
    atlas_flat: jax.Array  # (sum HW, 4) u8
    atlas_stride: int


def pack_shade_tables(materials: Materials, atlas: TextureAtlas) -> ShadeTables:
    """Host-side: dedupe material properties into group tables."""
    m = materials.alpha.shape[0]
    lut = np.asarray(materials.toon_lut)  # (M, 256, 3)
    knot_idx = np.linspace(0, 255, N_KNOTS).round().astype(np.int32)
    knots = lut[:, knot_idx, :].reshape(m, N_KNOTS * 3)
    ramp_uniq, ramp_gid = np.unique(knots.round(6), axis=0, return_inverse=True)

    n_tex, th, tw, _ = atlas.texels.shape
    tex_id = np.asarray(materials.tex_id)
    sizes = np.asarray(atlas.sizes)
    safe = np.maximum(tex_id, 0)
    cols = [sizes[safe, 0].astype(np.float32),
            sizes[safe, 1].astype(np.float32),
            (safe * th * tw).astype(np.float32),
            (tex_id >= 0).astype(np.float32)]
    if atlas.mip_base is not None:
        # per-level dense-chain base offsets (columns 4:4+L); level-l dims
        # derive in-kernel as max(h >> l, 1) — see TextureAtlas
        mb = np.asarray(atlas.mip_base)
        # texel indices ride f32 kernel lanes: beyond 2^24 the index grid
        # loses odd values (the padded level-0 atlas of the flagship model
        # already exceeds this at 21M rows — one reason the mip chain, at
        # 13M dense rows, is the default). Fail loudly rather than sample
        # off-by-one texels.
        assert atlas.mip_flat.shape[0] < (1 << 24), (
            f"mip chain has {atlas.mip_flat.shape[0]} rows; f32 texel "
            "indices are exact only below 2^24 — shard the atlas")
        cols.extend(mb[safe, l].astype(np.float32) for l in range(mb.shape[1]))
    tex_rows = np.stack(cols, axis=1)  # (M, 4 [+ L]) [h, w, base, valid, ...]
    tex_uniq, tex_gid = np.unique(tex_rows, axis=0, return_inverse=True)

    edge = np.asarray(materials.edge_color)  # (M, 4)
    edge_uniq, edge_gid = np.unique(edge[:, :3].round(6), axis=0, return_inverse=True)

    # The megakernel paths pack [ramp|tex|edge] gids into 4-bit fields of one
    # f32 material code (frame_tpu.pack_pass_rows); >=16 distinct groups would
    # silently overflow into the neighboring field (wrong texture / edge color
    # / corrupted hair bit). Fail loudly at pack time instead.
    for kind, uniq in (("toon ramp", ramp_uniq), ("texture", tex_uniq),
                       ("edge color", edge_uniq)):
        if uniq.shape[0] > 16:
            raise ValueError(
                f"model has {uniq.shape[0]} distinct {kind} groups; the packed "
                "material code supports at most 16 (widen the field encoding "
                "in frame_tpu.pack_pass_rows or dedupe the content)"
            )
    push_tab = np.stack(
        [np.asarray(materials.alpha),
         edge[:, 3],
         np.asarray(materials.is_hair).astype(np.float32),
         np.asarray(materials.is_eye).astype(np.float32),
         ramp_gid.astype(np.float32),
         tex_gid.astype(np.float32),
         edge_gid.astype(np.float32)], axis=1,
    )
    return ShadeTables(
        push_tab=jnp.asarray(push_tab, jnp.float32),
        knot_tab=jnp.asarray(ramp_uniq, jnp.float32),
        tex_tab=jnp.asarray(tex_uniq, jnp.float32),
        edge_tab=jnp.asarray(edge_uniq, jnp.float32),
        atlas_flat=atlas.texels.reshape(-1, 4),
        atlas_stride=int(atlas.texels.shape[2]),
    )


def _group_sel(gid, tab, col, n_groups, init=0.0):
    """Per-pixel scalar from a tiny group table: n_groups vector selects."""
    acc = jnp.full(gid.shape, init)
    for g in range(n_groups):
        acc = jnp.where(gid == g, tab[g, col], acc)
    return acc


def _shade_layer(
    stk, knot_tab, tex_tab, edge_tab, ldir, lcol, misc, inv_vp, xs, ys,
    wp, hp, kr, kt, ke, out_ref, base, n_levels,
):
    mat_present = stk[L_AEFF] > 0.0
    iw = jnp.maximum(stk[L_IW], 1e-8)
    inv_iw = 1.0 / iw
    u = stk[L_UIW] * inv_iw
    v = stk[L_VIW] * inv_iw
    nx = stk[L_NXIW] * inv_iw
    ny = stk[L_NYIW] * inv_iw
    nz = stk[L_NZIW] * inv_iw
    inv_len = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-16))
    nx, ny, nz = nx * inv_len, ny * inv_len, nz * inv_len

    # --- texel index (+ bilinear footprint) ---
    tex_gid = stk[L_TEX]
    tex_h = _group_sel(tex_gid, tex_tab, 0, kt, 1.0)
    tex_w = _group_sel(tex_gid, tex_tab, 1, kt, 1.0)
    tex_ok = _group_sel(tex_gid, tex_tab, 3, kt)
    if n_levels > 0:
        # ---- mip path: per-pixel LOD from screen-space uv derivatives,
        # indices into the dense mip chain (TextureAtlas.mip_flat) ----
        def fd(a, axis):
            # robust screen derivative: min-|.| of forward/backward diffs
            # (picks the within-surface side at fragment borders; roll
            # wraps at tile edges, harmless for LOD selection). pltpu.roll
            # requires shift >= 0: size-1 == -1 (rotation).
            f = pltpu.roll(a, a.shape[axis] - 1, axis) - a
            b2 = a - pltpu.roll(a, 1, axis)
            return jnp.where(jnp.abs(f) < jnp.abs(b2), f, b2)

        rho = jnp.maximum(
            jnp.maximum(jnp.abs(fd(u, 1)), jnp.abs(fd(u, 0))) * tex_w,
            jnp.maximum(jnp.abs(fd(v, 1)), jnp.abs(fd(v, 0))) * tex_h,
        )
        lod_bias = misc[0, 6 + base // O_CH]  # +1 per half-res layer
        lod = jnp.log2(jnp.maximum(rho, 1e-6)) + lod_bias
        level = jnp.clip(jnp.round(lod), 0.0, float(n_levels - 1))
        scale = jnp.exp2(-level)
        # exact max(dim >> l, 1): f32 scaling by 2^-l only shifts the
        # exponent, so floor matches the host's integer halving
        wl = jnp.maximum(jnp.floor(tex_w * scale), 1.0)
        hl = jnp.maximum(jnp.floor(tex_h * scale), 1.0)
        base_l = jnp.zeros_like(u)
        for l in range(n_levels):
            base_l = jnp.where(
                level == l, _group_sel(tex_gid, tex_tab, 4 + l, kt), base_l
            )
        tu = (u - jnp.floor(u)) * wl - 0.5
        tv = (v - jnp.floor(v)) * hl - 0.5
        x0 = jnp.clip(jnp.floor(tu), 0.0, wl - 1.0)
        y0 = jnp.clip(jnp.floor(tv), 0.0, hl - 1.0)
        fx = jnp.clip(tu - x0, 0.0, 1.0)
        fy = jnp.clip(tv - y0, 0.0, 1.0)
        dx = jnp.where(x0 + 1.0 <= wl - 1.0, 1.0, 0.0)
        dy = jnp.where(y0 + 1.0 <= hl - 1.0, wl, 0.0)
        texidx_bl = base_l + y0 * wl + x0
    else:
        tex_base = _group_sel(tex_gid, tex_tab, 2, kt)
        atlas_stride = misc[0, 5]
        tu = (u - jnp.floor(u)) * tex_w - 0.5
        tv = (v - jnp.floor(v)) * tex_h - 0.5
        x0 = jnp.clip(jnp.floor(tu), 0.0, tex_w - 1.0)
        y0 = jnp.clip(jnp.floor(tv), 0.0, tex_h - 1.0)
        fx = jnp.clip(tu - x0, 0.0, 1.0)
        fy = jnp.clip(tv - y0, 0.0, 1.0)
        dx = jnp.where(x0 + 1.0 <= tex_w - 1.0, 1.0, 0.0)
        dy = jnp.where(y0 + 1.0 <= tex_h - 1.0, atlas_stride, 0.0)
        # bilinear base texel; nearest = base + (fx>0.5)*dx + (fy>0.5)*dy
        texidx_bl = tex_base + y0 * atlas_stride + x0

    # --- toon lighting ---
    ramp_gid = stk[L_RAMP]
    ambient = misc[0, 0]
    acc_r = jnp.full(u.shape, 1.0) * ambient
    acc_g = acc_r
    acc_b = acc_r
    # per-pixel knots once (selected from <=few distinct ramps)
    knots = [
        [_group_sel(ramp_gid, knot_tab, s * 3 + c, kr) for c in range(3)]
        for s in range(N_KNOTS)
    ]
    for li in range(4):
        ndotl = jnp.maximum(
            -(nx * ldir[li, 0] + ny * ldir[li, 1] + nz * ldir[li, 2]), 0.0
        )
        f = ndotl * (N_KNOTS - 1)
        tr = jnp.zeros(u.shape)
        tg = jnp.zeros(u.shape)
        tb = jnp.zeros(u.shape)
        for s in range(N_KNOTS):
            w_hat = jnp.maximum(1.0 - jnp.abs(f - s), 0.0)
            tr = tr + knots[s][0] * w_hat
            tg = tg + knots[s][1] * w_hat
            tb = tb + knots[s][2] * w_hat
        acc_r = acc_r + tr * (lcol[li, 0] * ndotl)
        acc_g = acc_g + tg * (lcol[li, 1] * ndotl)
        acc_b = acc_b + tb * (lcol[li, 2] * ndotl)

    # --- world position + rim ---
    w_clip = inv_iw
    ndc_x = xs * (2.0 / wp) - 1.0
    ndc_y = 1.0 - ys * (2.0 / hp)
    z_ndc = stk[L_Z]
    wx = (ndc_x * inv_vp[0, 0] + ndc_y * inv_vp[0, 1] + z_ndc * inv_vp[0, 2] + inv_vp[0, 3]) * w_clip
    wy = (ndc_x * inv_vp[1, 0] + ndc_y * inv_vp[1, 1] + z_ndc * inv_vp[1, 2] + inv_vp[1, 3]) * w_clip
    wz = (ndc_x * inv_vp[2, 0] + ndc_y * inv_vp[2, 1] + z_ndc * inv_vp[2, 2] + inv_vp[2, 3]) * w_clip
    rim_int = misc[0, 1]
    vx = misc[0, 2] - wx
    vy = misc[0, 3] - wy
    vz = misc[0, 4] - wz
    inv_vlen = jax.lax.rsqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-16))
    ndotv = jnp.maximum((nx * vx + ny * vy + nz * vz) * inv_vlen, 0.0)
    rim_f = 1.0 - ndotv
    rim = rim_f * rim_f * rim_int

    # --- outline fragments: flat edge color, no albedo, no rim ---
    outline = stk[L_OUT] > 0.5
    edge_gid = stk[L_EDGE]
    lit_r = jnp.where(outline, _group_sel(edge_gid, edge_tab, 0, ke), acc_r)
    lit_g = jnp.where(outline, _group_sel(edge_gid, edge_tab, 1, ke), acc_g)
    lit_b = jnp.where(outline, _group_sel(edge_gid, edge_tab, 2, ke), acc_b)
    rim = jnp.where(outline, 0.0, rim)
    no_tex = outline | ~mat_present | (tex_ok <= 0.5)
    texsel = jnp.where(no_tex, -1.0, texidx_bl)

    out_ref[base + O_LR] = lit_r
    out_ref[base + O_LG] = lit_g
    out_ref[base + O_LB] = lit_b
    out_ref[base + O_RIM] = rim
    out_ref[base + O_TEX] = texsel
    # dy is stride-scaled (0 or the level/atlas row stride, possibly ODD
    # for non-POT mip levels); dx in {0,1}. Scale dy by 2 so the decoders'
    # dx = mod(dxdy, 2) stays exact for odd strides (advisor r3 medium).
    out_ref[base + O_DXDY] = dx + 2.0 * dy
    out_ref[base + O_FX] = fx
    out_ref[base + O_FY] = fy


def _shade_kernel(
    stack_ref, knot_ref, tex_ref, edge_ref, ldir_ref, lcol_ref, misc_ref,
    inv_vp_ref, out_ref,
    *, wp: int, hp: int, kr: int, kt: int, ke: int, n_levels: int,
    batched: bool = False,
):
    if batched:
        # grid (C, by, bx): stack/misc/inv_vp/out are per-character blocks.
        # misc arrives as a (1, 1, 8) block -> (1, 8) for _shade_layer
        stack_ref = stack_ref.at[0]
        misc_ref = misc_ref.at[0]
        inv_vp_ref = inv_vp_ref.at[0]
        out_ref = out_ref.at[0]
        x0 = (pl.program_id(2) * TILE_W).astype(jnp.float32)
        y0 = (pl.program_id(1) * TILE_H).astype(jnp.float32)
    else:
        x0 = (pl.program_id(1) * TILE_W).astype(jnp.float32)
        y0 = (pl.program_id(0) * TILE_H).astype(jnp.float32)
    xs = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
        + x0 + 0.5
    )
    ys = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
        + y0 + 0.5
    )
    for layer in range(2):
        stk = stack_ref[layer * L_CH:(layer + 1) * L_CH]
        base = layer * O_CH
        any_present = jnp.max(stk[L_AEFF]) > 0.0

        @pl.when(jnp.logical_not(any_present))
        def _():
            for ch in range(O_CH):
                out_ref[base + ch] = jnp.full(
                    (TILE_H, TILE_W), -1.0 if ch == O_TEX else 0.0
                )

        @pl.when(any_present)
        def _():
            _shade_layer(
                stk, knot_ref[...], tex_ref[...], edge_ref[...], ldir_ref[...],
                lcol_ref[...], misc_ref[...], inv_vp_ref[...], xs, ys,
                wp, hp, kr, kt, ke, out_ref, base, n_levels,
            )
        out_ref[base + O_AEFF] = stk[L_AEFF]


def shade_stack_tpu(
    stack: jax.Array,  # (2*L_CH, HP, WP)
    tables: ShadeTables,
    lights: Lights,
    ambient_unused,
    rim_intensity: float,
    eye_pos: jax.Array,
    inv_vp: jax.Array,
    interpret: bool = False,
    use_mips: bool = False,
    lod_bias: tuple[float, float] = (0.0, 0.0),
) -> jax.Array:
    """-> (2*O_CH, HP, WP) planar shade outputs per layer.

    With ``use_mips`` (and mip columns present in tex_tab) texel indices
    address TextureAtlas.mip_flat at a per-pixel LOD; ``lod_bias`` adds a
    per-layer bias (+1 for a half-res-fetched layer).

    A 4-D ``stack`` (C, 2*L_CH, HP, WP) shades a whole crowd in one launch
    (leading character grid axis); ``eye_pos``/``inv_vp`` then carry a
    leading C axis too and the result is (C, 2*O_CH, HP, WP).
    """
    batched = stack.ndim == 4
    hp, wp = stack.shape[-2:]
    n_levels = tables.tex_tab.shape[1] - 4 if use_mips else 0
    active = (jnp.arange(4) < lights.count).astype(jnp.float32)[:, None]
    lcol = lights.color * lights.intensity[:, None] * active
    ep = eye_pos if batched else eye_pos[None]  # (C, 3)
    c_dim = stack.shape[0] if batched else 1
    misc = jnp.stack([
        jnp.broadcast_to(lights.ambient, (c_dim,)),
        jnp.full((c_dim,), rim_intensity, jnp.float32),
        ep[:, 0], ep[:, 1], ep[:, 2],
        jnp.full((c_dim,), tables.atlas_stride, jnp.float32),
        jnp.full((c_dim,), lod_bias[0], jnp.float32),
        jnp.full((c_dim,), lod_bias[1], jnp.float32),
    ], axis=1)  # (C, 8)
    kernel = functools.partial(
        _shade_kernel, wp=wp, hp=hp,
        kr=tables.knot_tab.shape[0], kt=tables.tex_tab.shape[0],
        ke=tables.edge_tab.shape[0], n_levels=n_levels, batched=batched,
    )
    if batched:
        grid = (c_dim, hp // TILE_H, wp // TILE_W)
        stack_spec = pl.BlockSpec(
            (1, 2 * L_CH, TILE_H, TILE_W), lambda c, i, j: (c, 0, i, j),
            memory_space=pltpu.VMEM)
        # (C, 1, 8) with (1, 1, 8) blocks: block's last two dims equal the
        # array's, which Mosaic accepts for sub-(8,128) shapes
        misc = misc[:, None, :]
        misc_spec = pl.BlockSpec((1, 1, 8), lambda c, i, j: (c, 0, 0),
                                 memory_space=pltpu.VMEM)
        ivp_spec = pl.BlockSpec((1, 4, 4), lambda c, i, j: (c, 0, 0),
                                memory_space=pltpu.VMEM)
        out_specs = pl.BlockSpec(
            (1, 2 * O_CH, TILE_H, TILE_W), lambda c, i, j: (c, 0, i, j),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((c_dim, 2 * O_CH, hp, wp),
                                         jnp.float32)
        dims_sem = ("parallel", "parallel", "parallel")
        ivp = inv_vp
    else:
        grid = (hp // TILE_H, wp // TILE_W)
        stack_spec = pl.BlockSpec(
            (2 * L_CH, TILE_H, TILE_W), lambda i, j: (0, i, j),
            memory_space=pltpu.VMEM)
        misc_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        ivp_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        out_specs = pl.BlockSpec(
            (2 * O_CH, TILE_H, TILE_W), lambda i, j: (0, i, j),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((2 * O_CH, hp, wp), jnp.float32)
        dims_sem = ("parallel", "parallel")
        misc = misc[0:1]
        ivp = inv_vp
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            stack_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # knot_tab
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tex_tab
            pl.BlockSpec(memory_space=pltpu.VMEM),  # edge_tab
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ldir
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lcol
            misc_spec,
            ivp_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dims_sem,
        ),
        interpret=interpret,
    )(stack, tables.knot_tab, tables.tex_tab, tables.edge_tab,
      lights.direction, lcol, misc, inv_vp)
