"""MXU-based frame megakernel: rasterization as matrix multiplication.

The systolic array evaluates edge/depth planes for ALL pixels x ALL
triangles of a chunk in one pass: E(px, tri) = PXY(1024, 3) @ CO(3, 128)
— measured 62 ns per (tile, triangle) pair for full 4x-MSAA coverage +
winner selection (scripts/mxu_raster_proto.py), ~6x the sublane-group
formulation whose per-coefficient lane broadcasts (~79 ns each) dominate.

Structure per (8, 128)-pixel tile (grid step):
  * per-pixel state lives pixel-major in ONE (1024, 128) VMEM scratch with
    lane slots: [0:4] per-sample depth, [4:8] per-sample coverage bits,
    [8] packed best-fragment key (z-quantized << 14 | reversed draw id,
    via int bitcast), [16:39] resolved fragment channels, [40:64] the
    2-layer stack, [64] stencil;
  * per chunk of 128 pairs (DMA'd (128, 128) rows as in frame_tpu):
    - 4 plane matmuls x 5 sample positions (dot_general contracting the
      chunk's coefficient lanes — the pair-major layout needs no
      transpose);
    - depth test against the tile state (state columns broadcast across
      pair lanes via ones-matmul), per-sample min-reduce, coverage;
    - winner: integer packed (z, draw-order) key min-reduced over lanes;
    - fragment channels resolved by one-hot @ chunk matmul for pixels this
      chunk won;
  * pass epilogue pushes onto the stack (pixel-major selects);
  * output: the stack block (1024, 2*L_CH) per tile; XLA re-layouts to
    planar and runs the existing shade kernel + albedo + composite.

Reference parity: pass ordering/fixed-function state of
engine.ts:2123-2243, like frame_tpu.
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
    CHUNK,
    N_PASSES,
    PASS_CFG,
    ROW_W,
    FrameTables,
)

TILE_H = 8
TILE_W = 128
N_PX = TILE_H * TILE_W

# state lane slots
S_Z0 = 0  # 4 sample depths
S_WON = 4  # 4 sample coverage flags
S_BEST = 8  # packed best key (bitcast i32)
S_FRAG = 16  # 23 resolved fragment channels [alpha, hair, ramp, tex, edge,
#              a0..5, b0..5, c0..5] -> attr planes evaluated at resolve time
S_STACK = 40  # 2 * L_CH stack channels
S_STEN = 64  # stencil
N_FRAG = 23

COEFF_ROWS = 128  # full sublane height (partial HBM sublane slices fail at runtime)
ZQ = float(1 << 18)  # depth quantization for the packed winner key
IDB = 1 << 13  # draw-id bits (pairs per (pass, tile) segment < 8192)


# full-f32 matmuls: the TPU default precision truncates inputs to bf16,
# which breaks plane evaluation at large coordinates and one-hot selects
# of packed codes (see kernels/frame_stream.py PREC note)
PREC = jax.lax.Precision.HIGHEST


def _ones(n):
    return jnp.ones((1, n), jnp.float32)


def _bcast(col, n=128):
    """(1024, 1) -> (1024, n) via MXU outer product (lane broadcasts on the
    VPU cost ~79 ns/vreg; this is a single small matmul)."""
    return jnp.dot(col, _ones(n), preferred_element_type=jnp.float32,
                   precision=PREC)


def _process_chunk(
    state_ref, buf_ref, buft_ref, pxy_ref, tile_row, win_base, start, count,
    *, n_samples, depth_write, with_attrs,
):
    """Rasterize one 128-pair aligned window into the tile state.

    The window [win_base, win_base + 128) is 128-aligned in the pair stream
    (DMA lane-slices require it); pairs outside [start, start + count) are
    masked off. Plane matmuls contract the coefficient-major buffer
    (standard-layout MXU); the attribute one-hot contracts the pair-major
    buffer — no transposed-RHS matmuls (those forced per-matmul relayouts,
    ~27x slower in the first integration)."""
    chunk = buf_ref[...]  # (CHUNK, ROW_W) pair-major (attr resolve)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, CHUNK), 1)[0:1, :]
    g_idx = win_base + lane
    in_seg = (g_idx >= start) & (g_idx < start + count)
    valid_pair = in_seg.astype(jnp.float32)  # (1, 128)
    quad = buft_ref[...]  # (8, 512): [a;b;c;0..] x [e0|e1|e2|z] blocks
    # fold the tile origin into the plane constants (c' = c + a x0 + b y0)
    # so planes evaluate at tile-local coordinates — same f32 rounding per
    # tile as the grouped kernel (frame_tpu._process_group), which keeps
    # z-ties on near-coplanar geometry resolving consistently. tile_row
    # carries x0 at lane 8s+0 / y0 at 8s+1; x0/y0 are equal across sample
    # blocks so lanes 0/1 of the first block suffice.
    x0 = tile_row[0:1, 0:1]
    y0 = tile_row[0:1, 1:2]
    fold = quad[0:1, :] * x0 + quad[1:2, :] * y0  # (1, 512)
    row2 = (jax.lax.broadcasted_iota(jnp.int32, (8, 4 * CHUNK), 0) == 2)
    quad = quad + jnp.where(row2, jnp.broadcast_to(fold, (8, 4 * CHUNK)), 0.0)

    def planes(si):
        # ONE matmul evaluates all 4 planes for 128 pairs: in-kernel matmuls
        # are latency-bound (~0.45 us each), so batch into wide-N.
        # pxy is tile-local (the tile origin is folded into quad above).
        pxy = pxy_ref[:, 8 * si:8 * si + 8]  # (1024, 8), lanes 3+ are zero
        E = jnp.dot(pxy, quad, preferred_element_type=jnp.float32,
                    precision=PREC)
        e0 = E[:, 0:128]
        e1 = E[:, 128:256]
        e2 = E[:, 256:384]
        zz = E[:, 384:512]
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (valid_pair > 0)
        return inside, zz

    # --- per-sample depth test + coverage ---
    # all 4 sample depths broadcast across pair lanes with one matmul
    selz = (jax.lax.broadcasted_iota(jnp.int32, (8, 4 * CHUNK), 1) // CHUNK
            == jax.lax.broadcasted_iota(jnp.int32, (8, 4 * CHUNK), 0)
            ).astype(jnp.float32)[0:4, :]  # (4, 512)
    zb_all = jnp.dot(state_ref[:, S_Z0:S_Z0 + 4], selz,
                     preferred_element_type=jnp.float32,
                     precision=PREC)  # (1024, 512)
    any_pass = None
    for s in range(n_samples):
        inside, zz = planes(s)
        zb = zb_all[:, s * CHUNK:(s + 1) * CHUNK]
        passed = inside & (zz <= zb) & (zz >= 0.0) & (zz <= 1.0)
        zmin_s = jnp.min(jnp.where(passed, zz, 2.0), axis=1, keepdims=True)
        if depth_write:
            state_ref[:, S_Z0 + s:S_Z0 + s + 1] = jnp.minimum(
                state_ref[:, S_Z0 + s:S_Z0 + s + 1], zmin_s)
        state_ref[:, S_WON + s:S_WON + s + 1] = jnp.maximum(
            state_ref[:, S_WON + s:S_WON + s + 1],
            (zmin_s < 2.0).astype(jnp.float32),
        )
        any_pass = passed if any_pass is None else (any_pass | passed)

    # --- winner at pixel center: packed (z, draw order) integer key.
    # Gate = passed ANY sample (grouped-kernel rule): center-gating drops
    # silhouette fragments whose center lies outside the triangle ---
    _, zc = planes(n_samples)
    zq = jnp.clip(zc * ZQ, 0.0, ZQ - 1.0).astype(jnp.int32)
    seg_id = jnp.clip(g_idx - start, 0, IDB - 1)  # (1, 128) i32
    key = (zq << 13) | (IDB - 1 - seg_id)
    sentinel = jnp.int32(2 ** 31 - 1)
    key = jnp.where(any_pass, key, sentinel)
    kmin = jnp.min(key, axis=1, keepdims=True)  # (1024, 1) i32
    best = pltpu.bitcast(state_ref[:, S_BEST:S_BEST + 1], jnp.int32)
    new_best = jnp.minimum(best, kmin)
    state_ref[:, S_BEST:S_BEST + 1] = pltpu.bitcast(new_best, jnp.float32)

    # --- resolve fragment channels for pixels this chunk won ---
    win_id = (IDB - 1) - (new_best & (IDB - 1))  # (1024, 1) i32
    local = win_id - (win_base - start)
    # chunks own disjoint id ranges, so id-in-range means this chunk won
    won_now = (new_best < sentinel) & (local >= 0) & (local < CHUNK)
    onehot = (_bcast(local.astype(jnp.float32)) == lane.astype(jnp.float32))
    cols = chunk[:, C_ALPHA:C_ALPHA + N_FRAG]  # (128, 23)
    frag = jax.lax.dot_general(
        onehot.astype(jnp.float32), cols, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=PREC,
    )  # (1024, 23)
    wb = _bcast(won_now.astype(jnp.float32))[:, :N_FRAG]
    old = state_ref[:, S_FRAG:S_FRAG + N_FRAG]
    state_ref[:, S_FRAG:S_FRAG + N_FRAG] = frag * wb + old * (1.0 - wb)


def _push_pass_mxu(state_ref, pxyc, *, outline, write_stencil, use_stencil,
                   n_samples):
    """Push the pass's resolved fragments onto the 2-layer stack.

    Fragment channels: [alpha, hair, ramp, tex, edge, a0..5, b0..5, c0..5];
    attribute planes evaluate at the pixel center here (uiw etc), matching
    frame_tpu's winner-interpolated G-buffer.
    """
    st = state_ref[...]  # (1024, 128)
    cover = sum(st[:, S_WON + s:S_WON + s + 1] for s in range(n_samples)) \
        * (1.0 / n_samples)
    best = pltpu.bitcast(st[:, S_BEST:S_BEST + 1], jnp.int32)
    hit = (best < jnp.int32(2 ** 31 - 1)).astype(jnp.float32)
    zc = (best >> 13).astype(jnp.float32) * (1.0 / ZQ)

    frag = st[:, S_FRAG:S_FRAG + N_FRAG]
    # decode the packed material code (see pack_pass_rows)
    code = jnp.round(frag[:, 0:1]).astype(jnp.int32)
    alpha = (code & 1023).astype(jnp.float32) * (1.0 / 1023.0)
    rest = code >> 10
    is_hair = ((rest >> 12) & 1).astype(jnp.float32)
    gids = jnp.concatenate([
        (rest & 15).astype(jnp.float32),
        ((rest >> 4) & 15).astype(jnp.float32),
        ((rest >> 8) & 15).astype(jnp.float32),
    ], axis=1)  # ramp, tex, edge
    # attr planes at pixel center: u*iw etc = a*x + b*y + c
    a6 = frag[:, 5:11]
    b6 = frag[:, 11:17]
    c6 = frag[:, 17:23]
    px = pxyc[:, 0:1]
    py = pxyc[:, 1:2]
    attrs = a6 * _bcast(px, 6) + b6 * _bcast(py, 6) + c6  # (1024, 6)

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
        attrs, zc, a_eff,
        jnp.full((N_PX, 1), 1.0 if outline else 0.0),
        gids,
    ], axis=1)

    disp = _bcast(translucent * l1p, L)
    opq = _bcast(opaque, L)
    new_l0 = (1.0 - opq) * (disp * l1 + (1.0 - disp) * l0)
    pres = _bcast(present, L)
    new_l1 = pres * fstack + (1.0 - pres) * l1
    state_ref[:, S_STACK:S_STACK + L] = new_l0
    state_ref[:, S_STACK + L:S_STACK + 2 * L] = new_l1

    if write_stencil:
        state_ref[:, S_STEN:S_STEN + 1] = jnp.maximum(
            st[:, S_STEN:S_STEN + 1], hit * (cover > 0.0).astype(jnp.float32)
        )


def _frame_kernel_mxu(
    starts_ref, counts_ref,  # SMEM (N_PASSES, B)
    rows_hbm,  # ANY (CAP + CHUNK, ROW_W) pair-major
    rows_t_hbm,  # ANY (8, 4 * (CAP + CHUNK)) quad plane table
    pxy_ref,  # (1024, 48): 6 sample blocks of [x, y, 1, 0...] (tile-local)
    out_ref,  # (1024, 2*L_CH) block
    state_ref,  # scratch (1024, 128)
    buf_ref, buft_ref, sem_ref, semt_ref,  # DMA scratch + semaphores
    *,
    bx: int, n_samples: int,
):
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    b = bi * bx + bj
    x0 = (bj * TILE_W).astype(jnp.float32)
    y0 = (bi * TILE_H).astype(jnp.float32)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)[0:1, :]
    # per-tile origin correction, laid out like the pxy blocks: lane 8s+0
    # carries x0, lane 8s+1 carries y0
    m = jnp.mod(lane128, 8)
    tile_row = jnp.where(m == 0, x0, jnp.where(m == 1, y0, 0.0))

    state_ref[...] = jnp.zeros_like(state_ref)
    ones_init = jnp.ones((N_PX, 1), jnp.float32)
    for s in range(n_samples):
        state_ref[:, S_Z0 + s:S_Z0 + s + 1] = ones_init
    sent = pltpu.bitcast(
        jnp.full((N_PX, 1), 2 ** 31 - 1, jnp.int32), jnp.float32
    )
    trow_full = tile_row  # (1, 128), broadcasts over pixel rows in adds

    for p, (outline, depth_write, write_stencil, use_stencil) in enumerate(PASS_CFG):
        start = starts_ref[p, b]
        count = counts_ref[p, b]

        @pl.when(count > 0)
        def _():
            # reset per-pass channels: won, best
            for s in range(n_samples):
                state_ref[:, S_WON + s:S_WON + s + 1] = jnp.zeros((N_PX, 1))
            state_ref[:, S_BEST:S_BEST + 1] = sent
            # 128-aligned DMA windows covering [start, start + count)
            astart = (start // CHUNK) * CHUNK
            n_chunks = pl.cdiv(start + count - astart, CHUNK)

            def dma(slot, ci):
                return pltpu.make_async_copy(
                    rows_hbm.at[pl.ds(astart + ci * CHUNK, CHUNK), :],
                    buf_ref.at[slot],
                    sem_ref.at[slot],
                )

            def dma_t(slot, ci):
                return pltpu.make_async_copy(
                    rows_t_hbm.at[:, pl.ds((astart + ci * CHUNK) * 4,
                                           4 * CHUNK)],
                    buft_ref.at[slot],
                    semt_ref.at[slot],
                )

            dma(0, 0).start()
            dma_t(0, 0).start()

            def chunk_body(ci, _):
                slot = jax.lax.rem(ci, 2)

                @pl.when(ci + 1 < n_chunks)
                def _():
                    dma(jax.lax.rem(ci + 1, 2), ci + 1).start()
                    dma_t(jax.lax.rem(ci + 1, 2), ci + 1).start()

                dma(slot, ci).wait()
                dma_t(slot, ci).wait()
                win_base = astart + ci * CHUNK

                def use(bref, btref):
                    _process_chunk(
                        state_ref, bref, btref, pxy_ref, trow_full, win_base,
                        start, count, n_samples=n_samples,
                        depth_write=depth_write, with_attrs=not outline,
                    )

                @pl.when(slot == 0)
                def _():
                    use(buf_ref.at[0], buft_ref.at[0])

                @pl.when(slot == 1)
                def _():
                    use(buf_ref.at[1], buft_ref.at[1])

                return 0

            jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
            pxyc = pxy_ref[:, 8 * n_samples:8 * n_samples + 3] \
                + trow_full[:, 8 * n_samples:8 * n_samples + 3]
            _push_pass_mxu(
                state_ref, pxyc, outline=outline, write_stencil=write_stencil,
                use_stencil=use_stencil, n_samples=n_samples,
            )

    out_ref[...] = state_ref[:, S_STACK:S_STACK + 2 * ST.L_CH]


def render_megakernel_mxu(
    tables: FrameTables,
    *,
    hp: int,
    wp: int,
    n_samples: int,
    interpret: bool = False,
) -> jax.Array:
    """-> stack (B*1024, 2*L_CH) pixel-major, bin-major over tiles."""
    import numpy as np

    bx = wp // TILE_W
    by = hp // TILE_H
    b = bx * by
    ii = np.arange(N_PX)
    pxy = np.zeros((N_PX, 48), np.float32)
    for si in range(n_samples + 1):
        dx, dy = SAMPLE_OFFSETS[si] if si < n_samples else (0.0, 0.0)
        pxy[:, 8 * si + 0] = ii % TILE_W + 0.5 + dx
        pxy[:, 8 * si + 1] = ii // TILE_W + 0.5 + dy
        pxy[:, 8 * si + 2] = 1.0
    kernel = functools.partial(_frame_kernel_mxu, bx=bx, n_samples=n_samples)
    return pl.pallas_call(
        kernel,
        grid=(by, bx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # starts
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts
            pl.BlockSpec(memory_space=pl.ANY),  # rows (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # rows_t (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pxy
        ],
        out_specs=pl.BlockSpec(
            (N_PX, 2 * ST.L_CH), lambda i, j: (i * bx + j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * N_PX, 2 * ST.L_CH), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N_PX, 128), jnp.float32),  # state
            pltpu.VMEM((2, CHUNK, ROW_W), jnp.float32),  # pair-major DMA
            pltpu.VMEM((2, 8, 4 * CHUNK), jnp.float32),  # quad planes
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(tables.starts, tables.counts, tables.rows, tables.rows_t,
      jnp.asarray(pxy))
