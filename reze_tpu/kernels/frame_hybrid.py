"""Hybrid frame megakernel: MXU plane evaluation inside the grouped
kernel's per-(pass, bin)-segment control flow.

Round-4 on-chip attribution (scripts/mega_attrib.py) split the 11.91 ms
group megakernel into 1.51 ms tile constant + 1.26 us x 1697 segments +
8.26 ms BODY (~62 ns/pair: each 8-pair sublane group spends ~500 ns of
per-row vector ops, most of it winner bookkeeping on (8, 128) vregs that
carry only 8 pairs). This kernel replaces the body: one (1024, 8) @
(8, 512) matmul evaluates all four planes (3 edges + depth) of a whole
128-pair chunk for all 1024 tile pixels, so the per-pair vector cost
amortizes 16x. r2's MXU prototype measured ~20 ns/pair for this shape.

What the standalone MXU kernel (frame_mxu.py) got wrong, fixed here:
  * NO second HBM table: the pair rows carry 8-aligned coefficient triples
    (frame_tpu cols 64:96) and the (CHUNK, 32) slice transposes IN-KERNEL —
    the (8, 4N) XLA-side quad table is what blew up the 1080p compile and
    doubled pack bandwidth;
  * NO 6-pass HIGHEST matmuls: the pixel matrix is bf16-EXACT by
    construction (tile-local x + 0.5 <= 127.5 = 255 * 2^-1, y + 0.5 <= 7.5,
    1.0), so a manual hi/lo bf16 split of the coefficient side gives
    ~f32 plane values in 2 DEFAULT passes;
  * NO XLA re-layout of a pixel-major stack: after the last pass, eight
    (128, 32) transposes turn the stack columns back into (2*L_CH, 8, 128)
    tile rows and the SAME inline shade as the group kernel runs in place —
    identical output interface, downstream pipeline unchanged;
  * full-precision winner depth: the resolve pulls the winner's (za,zb,zc)
    plane and re-evaluates z at the pixel center in f32 (the packed winner
    key quantizes z to 2^-18 for ordering only).

Per-pixel state lives pixel-major in ONE (1024, 128) VMEM scratch
(p = 8-row-local y * 128 + x). Reference parity: pass ordering and
fixed-function state of engine.ts:2123-2243, like frame_tpu.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..render.raster import SAMPLE_OFFSETS
from . import shade_tpu as ST
from .frame_tpu import (
    C_ALPHA,
    C_HYB,
    CHUNK,
    N_PASSES,
    PASS_CFG,
    ROW_W,
    FrameTables,
)

TILE_H = 8
TILE_W = 128
N_PX = TILE_H * TILE_W

# pixel-major state lane slots
S_Z0 = 0    # center depth (analytic) / 4 sample depths (msaa)
S_WON = 4   # max coverage (analytic) / 4 sample hit flags (msaa)
S_BEST = 8  # packed best key (bitcast i32): z<<13 | (8191 - seg id)
S_FRAG = 16  # resolved winner row cols 8:40 [.. za zb zc .. code ig attrs]
S_STACK = 64  # 2 * L_CH stack channels (64:88)
S_STEN = 88  # stencil
F_W = 32    # resolved fragment width (row cols 8:40)
R_LO = 8    # first resolved row column

ZQ = float(1 << 18)
IDB = 1 << 13


def _hi_lo(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _bcast_exact(col, n=CHUNK):
    """(1024, 1) f32 -> (1024, n) lane broadcast, exact to a Dekker split
    (bf16 hi + f32 residual riding two DEFAULT-precision ones-matmuls)."""
    ones = jnp.ones((1, n), jnp.float32)
    hi, lo = _hi_lo(col)
    return _dot(hi, ones) + _dot(lo, ones)


def _bcast_small(col, n=CHUNK):
    """(1024, 1) -> (1024, n) for values bf16-exact as-is (flags, ids)."""
    return _dot(col, jnp.ones((1, n), jnp.float32))


def _process_chunk(
    state_ref, buf, pxy_ref, x0, y0, base, left,
    *, n_samples, depth_write, analytic,
):
    """Rasterize one <=128-pair chunk (pairs beyond ``left`` masked) into
    the pixel-major tile state. ``buf``: (CHUNK, ROW_W) pair rows whose
    first row is the segment row ``base = ci * CHUNK``."""
    coeff = buf[:, C_HYB:C_HYB + 32]  # (128, 32) aligned lane slice
    bt = coeff.T  # (32, 128) — Mosaic 2D transpose
    quad = jnp.concatenate(
        [bt[0:8], bt[8:16], bt[16:24], bt[24:32]], axis=1)  # (8, 512)
    # fold the tile origin into the plane constants (c' = c + a x0 + b y0):
    # tile-local evaluation keeps f32 rounding constant per tile (z-tie
    # stability, see frame_tpu._process_group)
    row2 = jax.lax.broadcasted_iota(jnp.int32, quad.shape, 0) == 2
    fold = quad[0:1, :] * x0 + quad[1:2, :] * y0
    quad = quad + jnp.where(row2, fold, 0.0)
    qh, ql = _hi_lo(quad)

    lane = jax.lax.broadcasted_iota(
        jnp.int32, (8, CHUNK), 1)[0:1, :]  # (1, 128) i32
    lanef = lane.astype(jnp.float32)
    validf = (lanef < left).astype(jnp.float32)

    def planes(si):
        pxy = pxy_ref[:, 8 * si:8 * si + 8]  # (1024, 8) bf16-exact
        E = _dot(pxy, qh) + _dot(pxy, ql)  # (1024, 512)
        return (E[:, 0:CHUNK], E[:, CHUNK:2 * CHUNK],
                E[:, 2 * CHUNK:3 * CHUNK], E[:, 3 * CHUNK:4 * CHUNK])

    if analytic:
        se0, se1, se2, zz = planes(n_samples)  # center block
        zb = _bcast_exact(state_ref[:, S_Z0:S_Z0 + 1])
        cov = (jnp.clip(se0 + 0.5, 0.0, 1.0) * jnp.clip(se1 + 0.5, 0.0, 1.0)
               * jnp.clip(se2 + 0.5, 0.0, 1.0)) * validf
        zok = (zz <= zb) & (zz >= 0.0) & (zz <= 1.0)
        any_pass = (cov > 0.0) & zok
        center = (se0 >= 0) & (se1 >= 0) & (se2 >= 0) & zok & (validf > 0)
        if depth_write:
            zmin_c = jnp.min(jnp.where(center, zz, 2.0), axis=1,
                             keepdims=True)
            state_ref[:, S_Z0:S_Z0 + 1] = jnp.minimum(
                state_ref[:, S_Z0:S_Z0 + 1], zmin_c)
        state_ref[:, S_WON:S_WON + 1] = jnp.maximum(
            state_ref[:, S_WON:S_WON + 1],
            jnp.max(jnp.where(any_pass, cov, 0.0), axis=1, keepdims=True))
        zc = zz
    else:
        zb_cols = state_ref[:, S_Z0:S_Z0 + n_samples]  # (1024, n)
        any_pass = None
        for s in range(n_samples):
            se0, se1, se2, zz = planes(s)
            inside = (se0 >= 0) & (se1 >= 0) & (se2 >= 0) & (validf > 0)
            zb = _bcast_exact(zb_cols[:, s:s + 1])
            passed = inside & (zz <= zb) & (zz >= 0.0) & (zz <= 1.0)
            zmin_s = jnp.min(jnp.where(passed, zz, 2.0), axis=1,
                             keepdims=True)
            if depth_write:
                state_ref[:, S_Z0 + s:S_Z0 + s + 1] = jnp.minimum(
                    zb_cols[:, s:s + 1], zmin_s)
            state_ref[:, S_WON + s:S_WON + s + 1] = jnp.maximum(
                state_ref[:, S_WON + s:S_WON + s + 1],
                (zmin_s < 2.0).astype(jnp.float32))
            any_pass = passed if any_pass is None else (any_pass | passed)
        se0, se1, se2, zc = planes(n_samples)  # center (winner z ordering)

    # winner: packed (quantized z, reversed SEGMENT-GLOBAL draw id)
    # min-reduce. Gate = passed ANY sample / has coverage (grouped rule).
    zq = jnp.clip(zc * ZQ, 0.0, ZQ - 1.0).astype(jnp.int32)
    gid = jnp.minimum(base + lane, IDB - 1)
    key = (zq << 13) | (IDB - 1 - gid)
    key = jnp.where(any_pass, key, jnp.int32(2 ** 31 - 1))
    kmin = jnp.min(key, axis=1, keepdims=True)  # (1024, 1) i32
    best = jax.lax.bitcast_convert_type(
        state_ref[:, S_BEST:S_BEST + 1], jnp.int32)
    new_best = jnp.minimum(best, kmin)
    state_ref[:, S_BEST:S_BEST + 1] = jax.lax.bitcast_convert_type(
        new_best, jnp.float32)

    # resolve the winner's row columns 8:40 for pixels this chunk won.
    # chunks own disjoint id ranges, so id-in-range means this chunk won;
    # the one-hot broadcast rides the CHUNK-LOCAL id (< 128, bf16-exact)
    local = (IDB - 1 - (new_best & (IDB - 1))) - base
    won_now = (new_best < 2 ** 31 - 1) & (local >= 0) & (local < CHUNK)
    onehot = (_bcast_small(local.astype(jnp.float32))
              == jnp.broadcast_to(lanef, (N_PX, CHUNK))).astype(jnp.float32)
    cols = buf[:, R_LO:R_LO + F_W]  # (128, 32): za zb zc .. code .. attrs
    ch, cl = _hi_lo(cols)
    frag = _dot(onehot, ch) + _dot(onehot, cl)  # (1024, 32)
    wb = _bcast_small(won_now.astype(jnp.float32), F_W)
    state_ref[:, S_FRAG:S_FRAG + F_W] = (
        frag * wb + state_ref[:, S_FRAG:S_FRAG + F_W] * (1.0 - wb))


def _push_pass(
    state_ref, px_g, py_g,
    *, outline, write_stencil, use_stencil, n_samples, analytic,
):
    """Push the pass's resolved fragments onto the pixel-major 2-layer
    stack. Fragment columns are raw row cols 8:40: z plane at 1:4
    (za zb zc), packed code at 6, attribute planes at 11:29."""
    st = state_ref[...]
    if analytic:
        cover = st[:, S_WON:S_WON + 1]
    else:
        cover = sum(st[:, S_WON + s:S_WON + s + 1]
                    for s in range(n_samples)) * (1.0 / n_samples)
    best = jax.lax.bitcast_convert_type(st[:, S_BEST:S_BEST + 1], jnp.int32)
    hit = (best < jnp.int32(2 ** 31 - 1)).astype(jnp.float32)

    frag = st[:, S_FRAG:S_FRAG + F_W]
    za = frag[:, 1:2]
    zb = frag[:, 2:3]
    zcc = frag[:, 3:4]
    z_exact = za * px_g + zb * py_g + zcc  # f32 winner z at pixel center
    code = jnp.round(frag[:, 6:7]).astype(jnp.int32)
    alpha = (code & 1023).astype(jnp.float32) * (1.0 / 1023.0)
    rest = code >> 10
    is_hair = ((rest >> 12) & 1).astype(jnp.float32)
    gids = jnp.concatenate([
        (rest & 15).astype(jnp.float32),
        ((rest >> 4) & 15).astype(jnp.float32),
        ((rest >> 8) & 15).astype(jnp.float32),
    ], axis=1)  # ramp, tex, edge
    a6 = frag[:, 11:17]
    b6 = frag[:, 17:23]
    c6 = frag[:, 23:29]
    attrs = a6 * _bcast_small(px_g, 6) + b6 * _bcast_small(py_g, 6) + c6

    a = alpha
    if use_stencil:
        sten = st[:, S_STEN:S_STEN + 1]
        a = a * jnp.where((sten > 0.5) & (is_hair > 0.5), 0.5, 1.0)
    a_eff = a * cover * hit
    present = (a_eff >= 0.001).astype(jnp.float32)
    a_eff = a_eff * present
    opaque = (a_eff > 0.999).astype(jnp.float32)
    translucent = present * (1.0 - opaque)

    L = ST.L_CH
    l0 = st[:, S_STACK:S_STACK + L]
    l1 = st[:, S_STACK + L:S_STACK + 2 * L]
    l1p = (l1[:, ST.L_AEFF:ST.L_AEFF + 1] > 0.0).astype(jnp.float32)

    # frag stack channels (1024, L): [uiw, viw, nxiw, nyiw, nziw, iw, z,
    # aeff, outline, ramp, tex, edge]
    fstack = jnp.concatenate([
        attrs, z_exact, a_eff,
        jnp.full((N_PX, 1), 1.0 if outline else 0.0),
        gids,
    ], axis=1)

    disp = _bcast_small(translucent * l1p, L)
    opq = _bcast_small(opaque, L)
    new_l0 = (1.0 - opq) * (disp * l1 + (1.0 - disp) * l0)
    pres = _bcast_small(present, L)
    new_l1 = pres * fstack + (1.0 - pres) * l1
    state_ref[:, S_STACK:S_STACK + L] = new_l0
    state_ref[:, S_STACK + L:S_STACK + 2 * L] = new_l1

    if write_stencil:
        state_ref[:, S_STEN:S_STEN + 1] = jnp.maximum(
            st[:, S_STEN:S_STEN + 1],
            hit * (cover > 0.0).astype(jnp.float32))


def _frame_kernel_hybrid(
    starts_ref, counts_ref,  # SMEM (1, N_PASSES, B)
    rows_hbm,  # ANY (CAP + CHUNK, ROW_W); leading C axis when batched
    pxy_ref,  # VMEM (1024, 48): per-sample [x y 1 0..] blocks, tile-local
    knot_ref, tex_ref, edge_ref, ldir_ref, lcol_ref, misc_ref, inv_vp_ref,
    out_ref,  # (2*O_CH, 8, 128) block
    state_ref,  # scratch (1024, 128) pixel-major
    stack_pl_ref,  # scratch (2*L_CH, 8, 128) planar stack for the shade
    buf_ref, sem_ref,  # DMA scratch: (2, CHUNK, ROW_W) + 2 sems
    *,
    bx: int, wp: int, hp: int, n_samples: int, kr: int, kt: int, ke: int,
    n_levels: int, batched: bool = False, analytic: bool = False,
):
    if batched:
        c = pl.program_id(0)
        bi = pl.program_id(1)
        bj = pl.program_id(2)
        rows_hbm = rows_hbm.at[c]
        misc_ref = misc_ref.at[0]
        inv_vp_ref = inv_vp_ref.at[0]
        out_ref = out_ref.at[0]
    else:
        bi = pl.program_id(0)
        bj = pl.program_id(1)
    b = bi * bx + bj
    x0 = (bj * TILE_W).astype(jnp.float32)
    y0 = (bi * TILE_H).astype(jnp.float32)

    state_ref[...] = jnp.zeros_like(state_ref)
    ones_col = jnp.ones((N_PX, 1), jnp.float32)
    for s in range(1 if analytic else n_samples):
        state_ref[:, S_Z0 + s:S_Z0 + s + 1] = ones_col
    sent = jax.lax.bitcast_convert_type(
        jnp.full((N_PX, 1), 2 ** 31 - 1, jnp.int32), jnp.float32)
    px_g = pxy_ref[:, 8 * n_samples:8 * n_samples + 1] + x0  # (1024, 1)
    py_g = pxy_ref[:, 8 * n_samples + 1:8 * n_samples + 2] + y0

    for p, (outline, depth_write, write_stencil, use_stencil) in enumerate(
            PASS_CFG):
        start = starts_ref[0, p, b]
        count = counts_ref[0, p, b]

        @pl.when(count > 0)
        def _():
            for s in range(1 if analytic else n_samples):
                state_ref[:, S_WON + s:S_WON + s + 1] = jnp.zeros(
                    (N_PX, 1), jnp.float32)
            state_ref[:, S_BEST:S_BEST + 1] = sent
            n_chunks = pl.cdiv(count, CHUNK)

            def dma(slot, ci):
                return pltpu.make_async_copy(
                    rows_hbm.at[pl.ds(start + ci * CHUNK, CHUNK), :],
                    buf_ref.at[slot],
                    sem_ref.at[slot],
                )

            dma(0, 0).start()

            def chunk_body(ci, _):
                slot = jax.lax.rem(ci, 2)

                @pl.when(ci + 1 < n_chunks)
                def _():
                    dma(jax.lax.rem(ci + 1, 2), ci + 1).start()

                dma(slot, ci).wait()
                left = (count - ci * CHUNK).astype(jnp.float32)

                def use(buf):
                    _process_chunk(
                        state_ref, buf[...], pxy_ref, x0, y0, ci * CHUNK,
                        left, n_samples=n_samples, depth_write=depth_write,
                        analytic=analytic,
                    )

                @pl.when(slot == 0)
                def _():
                    use(buf_ref.at[0])

                @pl.when(slot == 1)
                def _():
                    use(buf_ref.at[1])

                return 0

            jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
            _push_pass(
                state_ref, px_g, py_g,
                outline=outline, write_stencil=write_stencil,
                use_stencil=use_stencil, n_samples=n_samples,
                analytic=analytic,
            )

    # ---- planarize the stack: 8 x transpose((128, 2*L_CH)) ----
    for r in range(TILE_H):
        blk = state_ref[pl.ds(r * TILE_W, TILE_W),
                        S_STACK:S_STACK + 2 * ST.L_CH]  # (128, 24)
        stack_pl_ref[:, r:r + 1, :] = blk.T[:, None, :]

    # ---- inline shade (same math as frame_tpu's epilogue) ----
    xs32 = (
        jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32) + x0 + 0.5
    )
    ys32 = (
        jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32) + y0 + 0.5
    )
    for layer in range(2):
        stk = stack_pl_ref[layer * ST.L_CH:(layer + 1) * ST.L_CH]
        base = layer * ST.O_CH
        any_present = jnp.max(stk[ST.L_AEFF]) > 0.0

        @pl.when(jnp.logical_not(any_present))
        def _():
            for chn in range(ST.O_CH):
                out_ref[base + chn] = jnp.full(
                    (TILE_H, TILE_W), -1.0 if chn == ST.O_TEX else 0.0
                )

        @pl.when(any_present)
        def _():
            ST._shade_layer(
                stk, knot_ref[...], tex_ref[...], edge_ref[...],
                ldir_ref[...], lcol_ref[...], misc_ref[...], inv_vp_ref[...],
                xs32, ys32, wp, hp, kr, kt, ke, out_ref, base, n_levels,
            )
        out_ref[base + ST.O_AEFF] = stk[ST.L_AEFF]


def render_megakernel_hybrid(
    tables: FrameTables,
    shade_tables: ST.ShadeTables,
    lights,
    rim_intensity: float,
    eye_pos: jax.Array,
    inv_vp: jax.Array,
    *,
    hp: int,
    wp: int,
    n_samples: int,
    interpret: bool = False,
    use_mips: bool = False,
    lod_bias: tuple[float, float] = (0.0, 0.0),
    analytic: bool = False,
) -> jax.Array:
    """-> (2*O_CH, HP, WP) shade outputs — drop-in for
    frame_tpu.render_megakernel (same FrameTables, same output layout;
    batched tables add a leading C axis exactly like the group kernel)."""
    import numpy as np

    batched = tables.rows.ndim == 3
    c_dim = tables.rows.shape[0] if batched else 1
    bx = wp // TILE_W
    by = hp // TILE_H
    n_p = tables.starts.shape[-2]
    b_tot = tables.starts.shape[-1]
    active = (jnp.arange(4) < lights.count).astype(jnp.float32)[:, None]
    lcol = lights.color * lights.intensity[:, None] * active
    ep = eye_pos if batched else eye_pos[None]
    misc = jnp.stack([
        jnp.broadcast_to(lights.ambient, (c_dim,)),
        jnp.full((c_dim,), rim_intensity, jnp.float32),
        ep[:, 0], ep[:, 1], ep[:, 2],
        jnp.full((c_dim,), shade_tables.atlas_stride, jnp.float32),
        jnp.full((c_dim,), lod_bias[0], jnp.float32),
        jnp.full((c_dim,), lod_bias[1], jnp.float32),
    ], axis=1)  # (C, 8)

    ii = np.arange(N_PX)
    pxy = np.zeros((N_PX, 48), np.float32)
    ns_eff = 1 if analytic else n_samples
    for si in range(ns_eff + 1):
        if analytic or si >= n_samples:
            dx, dy = 0.0, 0.0
        else:
            dx, dy = SAMPLE_OFFSETS[si]
        pxy[:, 8 * si + 0] = ii % TILE_W + 0.5 + dx
        pxy[:, 8 * si + 1] = ii // TILE_W + 0.5 + dy
        pxy[:, 8 * si + 2] = 1.0
    # the kernel indexes the center block at 8 * n_samples
    ns_kernel = ns_eff

    kernel = functools.partial(
        _frame_kernel_hybrid, bx=bx, wp=wp, hp=hp, n_samples=ns_kernel,
        kr=shade_tables.knot_tab.shape[0], kt=shade_tables.tex_tab.shape[0],
        ke=shade_tables.edge_tab.shape[0],
        n_levels=shade_tables.tex_tab.shape[1] - 4 if use_mips else 0,
        batched=batched, analytic=analytic,
    )
    if batched:
        grid = (c_dim, by, bx)
        sc_spec = pl.BlockSpec((1, n_p, b_tot), lambda c, i, j: (c, 0, 0),
                               memory_space=pltpu.SMEM)
        misc = misc[:, None, :]
        misc_spec = pl.BlockSpec((1, 1, 8), lambda c, i, j: (c, 0, 0),
                                 memory_space=pltpu.VMEM)
        ivp_spec = pl.BlockSpec((1, 4, 4), lambda c, i, j: (c, 0, 0),
                                memory_space=pltpu.VMEM)
        out_specs = pl.BlockSpec(
            (1, 2 * ST.O_CH, TILE_H, TILE_W), lambda c, i, j: (c, 0, i, j),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(
            (c_dim, 2 * ST.O_CH, hp, wp), jnp.float32)
        dims_sem = ("arbitrary", "arbitrary", "arbitrary")
        starts, counts, ivp = tables.starts, tables.counts, inv_vp
    else:
        grid = (by, bx)
        sc_spec = pl.BlockSpec((1, n_p, b_tot), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.SMEM)
        misc_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        ivp_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        out_specs = pl.BlockSpec(
            (2 * ST.O_CH, TILE_H, TILE_W), lambda i, j: (0, i, j),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((2 * ST.O_CH, hp, wp), jnp.float32)
        dims_sem = ("arbitrary", "arbitrary")
        starts, counts, ivp = tables.starts[None], tables.counts[None], inv_vp
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            sc_spec,  # starts
            sc_spec,  # counts
            pl.BlockSpec(memory_space=pl.ANY),  # rows (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pxy
            pl.BlockSpec(memory_space=pltpu.VMEM),  # knot_tab
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tex_tab
            pl.BlockSpec(memory_space=pltpu.VMEM),  # edge_tab
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ldir
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lcol
            misc_spec,  # misc
            ivp_spec,  # inv_vp
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((N_PX, 128), jnp.float32),  # pixel-major state
            pltpu.VMEM((2 * ST.L_CH, TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((2, CHUNK, ROW_W), jnp.float32),  # DMA buffers
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dims_sem,
        ),
        interpret=interpret,
    )(starts, counts, tables.rows, jnp.asarray(pxy),
      shade_tables.knot_tab, shade_tables.tex_tab, shade_tables.edge_tab,
      lights.direction, lcol, misc, ivp)
