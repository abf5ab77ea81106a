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
S_BEST = 8  # winner's center z (f32 exact; 2.0 = no winner yet)
S_FRAG = 16  # resolved winner row cols 8:40 [.. za zb zc .. code ig attrs]
S_STACK = 64  # 2 * L_CH stack channels (64:88)
S_STEN = 88  # stencil
F_W = 32    # resolved fragment width (row cols 8:40)
R_LO = 8    # first resolved row column


def _hi_lo(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot3(onehot, cols):
    """EXACT one-hot row gather via the MXU. DEFAULT-precision dots round
    both operands to bf16, so a plain dot(onehot, cols) corrupts f32 row
    values (that was the round-5 on-chip 41%-of-pixels parity bug: global
    pixel coords and attribute planes are not bf16-exact). A 3-way split
    keeps 8+8+8 significand bits >= f32's 24; the selected value's three
    parts have disjoint exponent ranges, so the f32 sum reconstructs it
    exactly."""
    h1, r1 = _hi_lo(cols)
    h2, r2 = _hi_lo(r1)
    return _dot(onehot, h1) + _dot(onehot, h2) + _dot(onehot, r2)


def _process_chunk(
    state_ref, buf, pxy_ref, x0, y0, left,
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

    lane = jax.lax.broadcasted_iota(
        jnp.int32, (8, CHUNK), 1)[0:1, :]  # (1, 128) i32
    lanef = lane.astype(jnp.float32)
    validf = (lanef < left).astype(jnp.float32)
    pxy = pxy_ref[...]  # (1024, 8) tile-local [x+.5, y+.5, 1, 0..]: the
    # center coords are bf16-EXACT (x+0.5 = (2x+1)/2 <= 255/2: 8-bit
    # significand), so the DEFAULT-precision dot rounds them losslessly

    def planes(dx, dy):
        q = quad
        if dx != 0.0 or dy != 0.0:
            # sample-offset pixel coords are NOT bf16-exact (x+0.5+1/8
            # needs a 10-bit significand — the other round-5 on-chip
            # parity bug), so fold the offset into the constants instead:
            # e(x+dx, y+dy) = a x + b y + (c + a dx + b dy)
            off = quad[0:1, :] * dx + quad[1:2, :] * dy
            q = quad + jnp.where(row2, off, 0.0)
        # 3-way bf16 split: plane values exact to a few f32 ulps. The
        # 2-way split's ~2^-16-relative z error flipped depth tests and
        # winner picks against the grouped kernel on MMD's near-coplanar
        # layered geometry (measured on-chip r5: 11% of covered pixels)
        qh, r = _hi_lo(q)
        qm, ql = _hi_lo(r)
        E = _dot(pxy, qh) + _dot(pxy, qm) + _dot(pxy, ql)  # (1024, 512)
        return (E[:, 0:CHUNK], E[:, CHUNK:2 * CHUNK],
                E[:, 2 * CHUNK:3 * CHUNK], E[:, 3 * CHUNK:4 * CHUNK])

    if analytic:
        se0, se1, se2, zz = planes(0.0, 0.0)
        zcol = state_ref[:, S_Z0:S_Z0 + 1]  # (1024, 1) implicit broadcast
        cov = (jnp.clip(se0 + 0.5, 0.0, 1.0) * jnp.clip(se1 + 0.5, 0.0, 1.0)
               * jnp.clip(se2 + 0.5, 0.0, 1.0)) * validf
        zok = (zz <= zcol) & (zz >= 0.0) & (zz <= 1.0)
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
        any_pass = None
        for s in range(n_samples):
            se0, se1, se2, zz = planes(*SAMPLE_OFFSETS[s])
            inside = (se0 >= 0) & (se1 >= 0) & (se2 >= 0) & (validf > 0)
            zcol = state_ref[:, S_Z0 + s:S_Z0 + s + 1]
            passed = inside & (zz <= zcol) & (zz >= 0.0) & (zz <= 1.0)
            zmin_s = jnp.min(jnp.where(passed, zz, 2.0), axis=1,
                             keepdims=True)
            if depth_write:
                state_ref[:, S_Z0 + s:S_Z0 + s + 1] = jnp.minimum(
                    zcol, zmin_s)
            state_ref[:, S_WON + s:S_WON + s + 1] = jnp.maximum(
                state_ref[:, S_WON + s:S_WON + s + 1],
                (zmin_s < 2.0).astype(jnp.float32))
            any_pass = passed if any_pass is None else (any_pass | passed)
        se0, se1, se2, zc = planes(0.0, 0.0)  # center (winner z ordering)

    # winner: EXACT f32 z compare with draw-order ties — the grouped
    # kernel's semantics (latest-drawn pair at min z). Within the chunk:
    # max lane id among z == zmin. Across chunks: ids grow with chunk, so
    # a tie (zmin == best) goes to the LATER chunk via <=. (The earlier
    # packed-key formulation quantized z to 2^-18, which collapsed MMD's
    # near-coplanar layers into draw-order ties the grouped kernel
    # resolves by depth — 1 in 9 covered pixels flipped winners on-chip.)
    zmask = jnp.where(any_pass, zc, 2.0)
    zmin = jnp.min(zmask, axis=1, keepdims=True)  # (1024, 1)
    cand = jnp.where(zmask == zmin, lanef, -1.0)
    win_lane = jnp.max(cand, axis=1, keepdims=True)  # (1024, 1) f32
    best_z = state_ref[:, S_BEST:S_BEST + 1]
    won_now = (zmin < 2.0) & (zmin <= best_z)
    state_ref[:, S_BEST:S_BEST + 1] = jnp.where(won_now, zmin, best_z)

    # resolve the winner's row columns 8:40 for pixels this chunk won
    onehot = ((win_lane == lanef)
              & won_now).astype(jnp.float32)  # (1024, 128)
    cols = buf[:, R_LO:R_LO + F_W]  # (128, 32): za zb zc .. code .. attrs
    frag = _dot3(onehot, cols)  # (1024, 32) exact gather
    state_ref[:, S_FRAG:S_FRAG + F_W] = jnp.where(
        won_now, frag, state_ref[:, S_FRAG:S_FRAG + F_W])


def _push_pass(
    state_ref, px_l, py_l, x0, y0,
    *, outline, write_stencil, use_stencil, n_samples, analytic,
):
    """Push the pass's resolved fragments onto the pixel-major 2-layer
    stack. Fragment columns are raw row cols 8:40: z plane at 1:4
    (za zb zc), packed code at 6, attribute planes at 11:29.

    ``px_l``/``py_l`` are TILE-LOCAL center coords (1024, 1); the tile
    origin folds into the plane constants like frame_tpu._process_group
    (global coords reach 1919.5, which matters if any op ever routes them
    through a bf16-rounding path, and tile-local keeps rounding consistent
    with the grouped kernel's attribute evaluation)."""
    st = state_ref[...]
    if analytic:
        cover = st[:, S_WON:S_WON + 1]
    else:
        cover = sum(st[:, S_WON + s:S_WON + s + 1]
                    for s in range(n_samples)) * (1.0 / n_samples)
    hit = (st[:, S_BEST:S_BEST + 1] < 2.0).astype(jnp.float32)

    frag = st[:, S_FRAG:S_FRAG + F_W]
    za = frag[:, 1:2]
    zb = frag[:, 2:3]
    zcc = frag[:, 3:4]
    z_exact = za * px_l + zb * py_l + (zcc + za * x0 + zb * y0)
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
    attrs = a6 * px_l + b6 * py_l + (c6 + a6 * x0 + b6 * y0)

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

    # (1024, 1) masks broadcast implicitly against the (1024, L) layers
    disp = translucent * l1p
    new_l0 = (1.0 - opaque) * (disp * l1 + (1.0 - disp) * l0)
    new_l1 = present * fstack + (1.0 - present) * l1
    state_ref[:, S_STACK:S_STACK + L] = new_l0
    state_ref[:, S_STACK + L:S_STACK + 2 * L] = new_l1

    if write_stencil:
        state_ref[:, S_STEN:S_STEN + 1] = jnp.maximum(
            st[:, S_STEN:S_STEN + 1],
            hit * (cover > 0.0).astype(jnp.float32))


def _frame_kernel_hybrid(
    starts_ref, counts_ref,  # SMEM (1, N_PASSES, B)
    rows_hbm,  # ANY (CAP + CHUNK, ROW_W); leading C axis when batched
    pxy_ref,  # VMEM (1024, 8): tile-local [x+.5, y+.5, 1, 0..] (bf16-exact)
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
    sent = jnp.full((N_PX, 1), 2.0, jnp.float32)  # z sentinel: no winner
    px_l = pxy_ref[:, 0:1]  # (1024, 1) tile-local center coords
    py_l = pxy_ref[:, 1:2]

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
                        state_ref, buf[...], pxy_ref, x0, y0, left,
                        n_samples=n_samples, depth_write=depth_write,
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
                state_ref, px_l, py_l, x0, y0,
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

    # ONE center coordinate block; sample offsets fold into the plane
    # constants in-kernel (offset pixel coords are not bf16-exact)
    ii = np.arange(N_PX)
    pxy = np.zeros((N_PX, 8), np.float32)
    pxy[:, 0] = ii % TILE_W + 0.5
    pxy[:, 1] = ii // TILE_W + 0.5
    pxy[:, 2] = 1.0
    ns_kernel = 1 if analytic else n_samples

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
